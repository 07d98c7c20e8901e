"""Per-file key statistics + point-read file pruning.

Every committed data file records (repo, path) min/max bounds and a row
count in the manifest, read from the parquet FOOTER at commit time (no data
pages touched) — the Iceberg manifest-entry lower_bounds/upper_bounds
analog. `lookup()` then prunes, driver-side and with zero Spark jobs:
bucket first (pure-Python XXH64), then every file whose bounds exclude the
key. At 100 TB this turns a point read from "scan the bucket's whole delta
chain" into "scan one or two files".

Soundness invariant under MOR: a pruned file provably holds NO row of the
key, so last-writer-wins over the surviving files sees every version of
the key — pruning can never resurrect an older value or miss a tombstone.
"""

import os

import pytest
from pyspark.sql import functions as F

from kafka_mongo_watcher_spark.plans.lake import LakeTable, _footer_key_stats

from tests.test_lake_mor import _batch, _row


def _mk(spark, tmp_path, mode, **kw):
    return LakeTable.create(
        spark, str(tmp_path / f"t_{mode}"), n_buckets=2, write_mode=mode, **kw
    )


def _merge_range(t, spark, lo, hi, seq, op="insert", content="c"):
    """One merge whose keys are repo_{lo}..repo_{hi} — a disjoint repo range
    per batch, so per-file bounds separate cleanly."""
    rows = [
        _row(op, f"repo_{i:04d}", "main.py", seq * 1000 + i, content)
        for i in range(lo, hi)
    ]
    t.merge(_batch(spark, rows), source_id="s", batch_id=seq)


def _total_files(t, repo, path):
    b = str(t.bucket_of(repo, path))
    return len(t._entry_files("buckets", b)) + len(t._entry_files("deltas", b))


def test_footer_stats_recorded_per_delta_file(spark, tmp_path):
    t = _mk(spark, tmp_path, "mor")
    _merge_range(t, spark, 0, 40, seq=1)
    _merge_range(t, spark, 40, 80, seq=2)
    for b in t.manifest["deltas"]:
        stats = t._stats_of(b)
        files = t._entry_files("deltas", b)
        assert set(stats) == set(files)
        for f in files:
            rmin, rmax, pmin, pmax, rows = stats[f]
            assert rmin <= rmax and pmin <= pmax and rows > 0
            # bounds round-trip: re-reading the footer agrees
            assert _footer_key_stats(os.path.join(t.path, f))[:4] == [
                rmin, rmax, pmin, pmax,
            ]


def test_lookup_prunes_disjoint_range_files(spark, tmp_path):
    """3 merges with disjoint repo ranges → a point read scans only the one
    delta file whose bounds cover the key, not the whole chain."""
    t = _mk(spark, tmp_path, "mor")
    spark.conf.set("kmw.mor.maxDeltasPerBucket", "100")  # keep chains visible
    try:
        _merge_range(t, spark, 0, 40, seq=1)
        _merge_range(t, spark, 40, 80, seq=2)
        _merge_range(t, spark, 80, 120, seq=3)
        repo = "repo_0100"  # only in batch 3's range
        base, deltas = t._lookup_files(repo, "main.py")
        assert len(base) + len(deltas) == 1
        assert _total_files(t, repo, "main.py") == 3
        got = t.lookup(repo, "main.py").collect()
        assert len(got) == 1 and got[0]["repo"] == repo
    finally:
        spark.conf.unset("kmw.mor.maxDeltasPerBucket")


def test_pruned_lookup_equals_snapshot_filter_including_tombstones(spark, tmp_path):
    """Soundness: for EVERY key ever written (incl. updated and deleted
    ones), the pruned lookup equals the unpruned snapshot filter."""
    t = _mk(spark, tmp_path, "mor")
    spark.conf.set("kmw.mor.maxDeltasPerBucket", "100")
    try:
        _merge_range(t, spark, 0, 30, seq=1)
        _merge_range(t, spark, 10, 40, seq=2, op="update", content="v2")
        _merge_range(t, spark, 20, 25, seq=3, op="delete")
        snap = {
            (r["repo"], r["path"]): (r["content"], r["commit_seq"])
            for r in t.snapshot().collect()
        }
        for i in range(0, 40):
            repo = f"repo_{i:04d}"
            got = t.lookup(repo, "main.py").collect()
            want = snap.get((repo, "main.py"))
            if want is None:
                assert got == [], repo
            else:
                assert len(got) == 1, repo
                assert (got[0]["content"], got[0]["commit_seq"]) == want, repo
    finally:
        spark.conf.unset("kmw.mor.maxDeltasPerBucket")


def test_compaction_refreshes_stats_and_keeps_pruning(spark, tmp_path):
    t = _mk(spark, tmp_path, "mor")
    _merge_range(t, spark, 0, 60, seq=1)
    _merge_range(t, spark, 0, 60, seq=2, op="update", content="v2")
    t.compact()
    for b in t.manifest["buckets"]:
        stats = t._stats_of(b)
        assert set(stats) == set(t._entry_files("buckets", b))
    got = t.lookup("repo_0033", "main.py").collect()
    assert len(got) == 1 and got[0]["content"] == "v2"


def test_cow_writes_record_stats_and_prune(spark, tmp_path):
    t = _mk(spark, tmp_path, "cow")
    _merge_range(t, spark, 0, 60, seq=1)
    _merge_range(t, spark, 20, 30, seq=2, op="update", content="v2")
    for b in t.manifest["buckets"]:
        assert set(t._stats_of(b)) == set(t._entry_files("buckets", b))
    got = t.lookup("repo_0025", "main.py").collect()
    assert len(got) == 1 and got[0]["content"] == "v2"


def test_stats_survive_sidecar_externalization(spark, tmp_path):
    """Force every manifest entry out to sidecar blobs: pruning still works
    (stats resolve through the same immutable-blob indirection as file
    lists), and the root manifest stays O(buckets)."""
    spark.conf.set("kmw.manifest.inlineMaxFilesPerBucket", "0")
    spark.conf.set("kmw.mor.maxDeltasPerBucket", "100")
    try:
        t = _mk(spark, tmp_path, "mor")
        _merge_range(t, spark, 0, 40, seq=1)
        _merge_range(t, spark, 40, 80, seq=2)
        assert all(
            isinstance(e, dict) and set(e) == {"ref", "n"}
            for e in t.manifest["file_stats"].values()
        )
        repo = "repo_0050"
        base, deltas = t._lookup_files(repo, "main.py")
        assert len(base) + len(deltas) == 1
        assert t.lookup(repo, "main.py").count() == 1
    finally:
        spark.conf.unset("kmw.manifest.inlineMaxFilesPerBucket")
        spark.conf.unset("kmw.mor.maxDeltasPerBucket")


def test_missing_stats_degrade_to_scan_not_wrong_answer(spark, tmp_path):
    """Files without a stats entry (e.g. written with kmw.stats.collect=
    false, or by an older engine) are always scanned."""
    spark.conf.set("kmw.stats.collect", "false")
    try:
        t = _mk(spark, tmp_path, "mor")
        _merge_range(t, spark, 0, 40, seq=1)
        assert t.manifest["file_stats"] == {}
        repo = "repo_0007"
        base, deltas = t._lookup_files(repo, "main.py")
        assert len(base) + len(deltas) == _total_files(t, repo, "main.py")
        assert t.lookup(repo, "main.py").count() == 1
    finally:
        spark.conf.unset("kmw.stats.collect")


def test_expire_snapshots_keeps_referenced_stats_blobs(spark, tmp_path):
    spark.conf.set("kmw.manifest.inlineMaxFilesPerBucket", "0")
    spark.conf.set("kmw.mor.maxDeltasPerBucket", "100")
    try:
        t = _mk(spark, tmp_path, "mor")
        _merge_range(t, spark, 0, 40, seq=1)
        _merge_range(t, spark, 40, 80, seq=2)
        _merge_range(t, spark, 80, 120, seq=3)
        t.expire_snapshots(keep_last=1)
        t = t.refresh()
        # current version's stats blobs survived; pruning still exact
        base, deltas = t._lookup_files("repo_0100", "main.py")
        assert len(base) + len(deltas) == 1
        assert t.lookup("repo_0100", "main.py").count() == 1
    finally:
        spark.conf.unset("kmw.manifest.inlineMaxFilesPerBucket")
        spark.conf.unset("kmw.mor.maxDeltasPerBucket")


def test_key_sorted_writes_make_multi_file_base_prunable(spark, tmp_path):
    """Writes are key-sorted within each task (kmw.write.sortByKey default),
    so even same-range batches produce files whose bounds a lookup can
    separate after compaction collapses them into sorted base files."""
    t = _mk(spark, tmp_path, "mor")
    _merge_range(t, spark, 0, 200, seq=1)
    t.compact()
    b = str(t.bucket_of("repo_0000", "main.py"))
    stats = t._stats_of(b)
    for f in t._entry_files("buckets", b):
        rmin, rmax, *_ = stats[f]
        assert rmin <= rmax
    # every key resolvable through the pruned path
    for i in (0, 99, 199):
        assert t.lookup(f"repo_{i:04d}", "main.py").count() == 1


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_lookup_plans_zero_jobs_for_pruning(spark, tmp_path, mode):
    """Planning a lookup (bucket + file pruning) runs no Spark job — the
    returned DataFrame is the first thing that touches the cluster."""
    t = _mk(spark, tmp_path, mode)
    _merge_range(t, spark, 0, 20, seq=1)
    sc = spark.sparkContext
    before = sc._jsc.sc().dagScheduler().nextJobId()
    df = t.lookup("repo_0003", "main.py")
    after = sc._jsc.sc().dagScheduler().nextJobId()
    assert after == before
    assert df.count() == 1
