"""Retention GC (`expire_snapshots`) + wall-clock time travel
(`at_timestamp`) — the Iceberg expire_snapshots / TIMESTAMP AS OF analogs.
Expiry must delete exactly the files no retained manifest references, never
anything the live table (or a retained snapshot) still needs, and must be a
pure driver-side metadata operation (no Spark job)."""

import os

import pytest

from kafka_mongo_watcher_spark.plans.lake import LakeTable

from tests.test_lake_mor import _batch, _row, _state


def _make(spark, tmp_path, ticks):
    """MOR table with a deterministic commit clock: v0 (create) is stamped
    ticks[0], each later commit takes the next tick (injectable-clock seam)."""
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4, write_mode="mor")
    it = iter(ticks[1:])
    t._clock = lambda: next(it)
    m0 = t._manifest_at(0)
    m0["committed_at"] = ticks[0]
    t._write_manifest(t.path, m0)
    t.manifest = m0
    return t


def _seq(spark, tmp_path):
    t = _make(spark, tmp_path, [100.0, 200.0, 300.0, 400.0, 500.0])
    t.merge(_batch(spark, [
        _row("insert", "r", "p", 1), _row("insert", "r", "q", 2),
    ]), source_id="s", batch_id=0)                       # v1 @200
    t.merge(_batch(spark, [
        _row("update", "r", "p", 5, "v5"), _row("delete", "r", "q", 4),
    ]), source_id="s", batch_id=1)                       # v2 @300
    t.compact()                                          # v3 @400
    t.merge(_batch(spark, [
        _row("insert", "s", "x", 7),
    ]), source_id="s", batch_id=2)                       # v4 @500
    return t


def _disk_parquet(t):
    out = set()
    for dirpath, _d, fns in os.walk(os.path.join(t.path, "data")):
        for fn in fns:
            if fn.endswith(".parquet"):
                out.add(os.path.relpath(os.path.join(dirpath, fn), t.path))
    return out


def test_at_timestamp_picks_last_commit_at_or_before(spark, tmp_path):
    t = _seq(spark, tmp_path)
    assert t.at_timestamp(250.0).version == 1
    assert t.at_timestamp(300.0).version == 2   # inclusive
    assert t.at_timestamp(1e9).version == 4
    assert _state(t.at_timestamp(250.0)) == _state(t.at_version(1))
    with pytest.raises(ValueError, match="no commit at or before"):
        t.at_timestamp(50.0)


def test_expire_keep_last_drops_old_versions_and_their_files(spark, tmp_path):
    t = _seq(spark, tmp_path)
    before_state = _state(t)
    pre_files = _disk_parquet(t)
    stats = t.expire_snapshots(keep_last=2)       # retain v3, v4
    assert stats["retained_versions"] == [3, 4]
    assert stats["expired_versions"] == 3         # v0, v1, v2
    # v1/v2 delta files were folded by the v3 compaction -> now unreferenced
    assert stats["data_files_removed"] > 0
    assert stats["bytes_removed"] > 0
    post_files = _disk_parquet(t)
    assert post_files < pre_files
    # everything still referenced is still on disk and the live state is intact
    assert _state(t) == before_state
    assert _state(t.at_version(3)) == {("r", "p"): ("commit5", "v5", 5)}
    assert _state(t.at_version(4)) == before_state != {}
    for v in (0, 1, 2):
        with pytest.raises(ValueError, match="no committed version"):
            t.at_version(v)
    # history lists only retained versions
    assert [e["version"] for e in t.history()] == [3, 4]
    # changelog over the retained range still works; expired range raises
    assert {r["repo"] for r in t.changes(3).collect()} == {"s"}
    with pytest.raises(ValueError, match="no committed version"):
        t.changes(0).collect()


def test_expire_never_deletes_files_referenced_by_retained(spark, tmp_path):
    """v4's manifest still references v3's compacted base files: retaining
    only the last 2 versions must keep every v3 base file on disk."""
    t = _seq(spark, tmp_path)
    t.expire_snapshots(keep_last=2)
    referenced = set()
    for v in (3, 4):
        m = t._manifest_at(v)
        for section in ("buckets", "deltas"):
            for b in m.get(section, {}):
                referenced.update(t._entry_files(section, b, manifest=m))
    assert referenced <= _disk_parquet(t)


def test_expire_older_than_retains_young_commits(spark, tmp_path):
    t = _seq(spark, tmp_path)                     # commits at 100..500
    t._clock = lambda: 550.0                      # "now"
    stats = t.expire_snapshots(older_than_s=200.0)  # cutoff 350 -> keep v3,v4
    assert stats["retained_versions"] == [3, 4]
    assert [e["version"] for e in t.history()] == [3, 4]


def test_expire_requires_criterion_and_writability(spark, tmp_path):
    t = _seq(spark, tmp_path)
    with pytest.raises(ValueError, match="keep_last"):
        t.expire_snapshots()
    with pytest.raises(ValueError, match="read-only"):
        t.at_version(4).expire_snapshots(keep_last=1)


def test_expire_is_idempotent_and_keep_last_zero_keeps_current(spark, tmp_path):
    t = _seq(spark, tmp_path)
    s1 = t.expire_snapshots(keep_last=0)          # current only
    assert s1["retained_versions"] == [4]
    s2 = t.expire_snapshots(keep_last=0)
    assert s2["expired_versions"] == 0 and s2["data_files_removed"] == 0
    assert _state(t) != {}
