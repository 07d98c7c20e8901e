"""Optimistic-concurrency commit protection (Iceberg catalog-CAS analog).

The engine's contract is single-writer per table, but a misconfigured
deployment (two streaming queries on one table, a manual compaction racing
an ingest job) must corrupt NOTHING: of two writers targeting the same
version, exactly one commits — the other raises `ConcurrentCommitError`,
its data files are unreferenced orphans (GC'd by `expire_snapshots`), and
a refresh+retry re-applies cleanly under batch-id fencing."""

import os

import pytest

from kafka_mongo_watcher_spark.plans.lake import ConcurrentCommitError, LakeTable

from tests.test_lake_mor import _batch, _row, _state


def test_stale_writer_loses_commit_race_and_state_is_winners(spark, tmp_path):
    path = str(tmp_path / "t")
    a = LakeTable.create(spark, path, n_buckets=4, write_mode="mor")
    b = LakeTable(spark, path)  # second handle, same v0 manifest
    a.merge(_batch(spark, [_row("insert", "r", "p", 1)]),
            source_id="A", batch_id=0)  # commits v1
    with pytest.raises(ConcurrentCommitError, match="version 1"):
        b.merge(_batch(spark, [_row("insert", "r", "q", 2)]),
                source_id="B", batch_id=0)  # also targets v1 → must lose
    # winner's commit is intact and the loser referenced nothing
    assert _state(a) == {("r", "p"): ("commit1", "c", 1)}
    assert _state(LakeTable(spark, path)) == _state(a)


def test_loser_retries_cleanly_after_refresh(spark, tmp_path):
    path = str(tmp_path / "t")
    a = LakeTable.create(spark, path, n_buckets=4, write_mode="mor")
    b = LakeTable(spark, path)
    a.merge(_batch(spark, [_row("insert", "r", "p", 1)]), source_id="A", batch_id=0)
    with pytest.raises(ConcurrentCommitError):
        b.merge(_batch(spark, [_row("insert", "r", "q", 2)]), source_id="B", batch_id=0)
    b = b.refresh()
    b.merge(_batch(spark, [_row("insert", "r", "q", 2)]), source_id="B", batch_id=0)
    assert _state(b) == {
        ("r", "p"): ("commit1", "c", 1), ("r", "q"): ("commit2", "c", 2),
    }
    # both sources' fencing entries present
    assert b.manifest["applied"] == {"A": 0, "B": 0}


def test_losing_attempts_files_are_orphans_swept_by_gc(spark, tmp_path):
    path = str(tmp_path / "t")
    a = LakeTable.create(spark, path, n_buckets=4, write_mode="mor")
    b = LakeTable(spark, path)
    a.merge(_batch(spark, [_row("insert", "r", "p", 1)]), source_id="A", batch_id=0)
    with pytest.raises(ConcurrentCommitError):
        b.merge(_batch(spark, [_row("insert", "r", "q", 2)]), source_id="B", batch_id=0)

    def data_files():
        out = []
        for dp, _dn, fns in os.walk(os.path.join(path, "data")):
            out += [os.path.join(dp, f) for f in fns if f.endswith(".parquet")]
        return set(out)

    referenced = {
        os.path.join(path, f)
        for sec in ("buckets", "deltas")
        for bkt in a.manifest[sec]
        for f in a._entry_files(sec, bkt)
    }
    orphans = data_files() - referenced
    assert orphans  # the losing attempt left files behind...
    a.expire_snapshots(keep_last=0)
    assert data_files() == referenced  # ...and GC swept exactly those
    assert _state(a) == {("r", "p"): ("commit1", "c", 1)}
