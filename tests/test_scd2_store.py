"""Streaming SCD2 dimension maintenance (plans/scd2_store.py +
streaming.run.run_dimension_stream).

The invariant under test everywhere: maintaining the dimension one
micro-batch at a time over an ordered event log produces EXACTLY the table
a single batch recompute (operators/scd.scd2_history) builds from the full
log — the warehouse consumer of the reference watcher's feed
(/root/reference/internal/app/watcher.go) never sees a difference.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_mongo_watcher_spark.datagen import generate_events, write_event_log
from kafka_mongo_watcher_spark.operators.envelope import transform_events
from kafka_mongo_watcher_spark.operators.scd import scd2_history
from kafka_mongo_watcher_spark.plans.scd2_store import Scd2Store
from kafka_mongo_watcher_spark.streaming.run import run_dimension_stream

KW = dict(
    key_cols=["repo", "path"],
    order_col="commit_seq",
    attr_cols=["content_sha256", "lang"],
    tie_breakers=[],
    delete_col="is_delete",
)


def _prepared(spark, log_dir):
    ev = spark.read.parquet(f"{log_dir}/chunk_*")
    return transform_events(ev, fingerprint=True).withColumn(
        "is_delete", F.col("op") == "delete"
    )


def _rowset(df):
    return {tuple(sorted(r.asDict().items())) for r in df.collect()}


@pytest.fixture(scope="module")
def dim_env(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dim")
    ev = generate_events(spark, 3000, n_repos=10, n_paths=12)
    write_event_log(ev, str(tmp / "log"), n_chunks=3)
    stats = run_dimension_stream(
        spark,
        log_dir=str(tmp / "log"),
        dim_path=str(tmp / "dim"),
        checkpoint_dir=str(tmp / "ckpt"),
        n_buckets=8,
    )
    return tmp, stats


def test_dimension_stream_matches_batch_recompute(spark, dim_env):
    tmp, stats = dim_env
    assert [s["skipped"] for s in stats] == [False] * 3
    store = Scd2Store(spark, str(tmp / "dim"))
    kw = dict(KW)
    kw.pop("tie_breakers")
    expect = scd2_history(
        _prepared(spark, tmp / "log"),
        key_cols=kw["key_cols"],
        order_col=kw["order_col"],
        attr_cols=kw["attr_cols"],
        delete_col=kw["delete_col"],
    )
    assert _rowset(store.history()) == _rowset(expect)


def test_dimension_stream_resume_is_noop(spark, dim_env):
    tmp, _ = dim_env
    v0 = Scd2Store(spark, str(tmp / "dim")).version
    stats2 = run_dimension_stream(
        spark,
        log_dir=str(tmp / "log"),
        dim_path=str(tmp / "dim"),
        checkpoint_dir=str(tmp / "ckpt"),
        n_buckets=8,
    )
    # checkpoint already covers every file: no epochs fire, version frozen
    assert all(s["skipped"] for s in stats2)
    assert Scd2Store(spark, str(tmp / "dim")).version == v0


def test_dimension_delete_semantics_end_to_end(spark, dim_env):
    tmp, _ = dim_env
    store = Scd2Store(spark, str(tmp / "dim"))
    hist = store.history()
    prepared = _prepared(spark, tmp / "log")
    w_last = (
        prepared.groupBy("repo", "path")
        .agg(F.max_by("is_delete", "commit_seq").alias("last_is_delete"))
    )
    dead = {(r["repo"], r["path"]) for r in w_last.collect() if r["last_is_delete"]}
    live_rows = hist.filter("is_current").select("repo", "path").collect()
    live = {(r["repo"], r["path"]) for r in live_rows}
    assert len(live_rows) == len(live)  # exactly one current row per live key
    assert not (live & dead)  # keys whose last op is delete have no current row


def test_store_fences_replayed_batch(spark, tmp_path):
    store = Scd2Store.create(
        spark, str(tmp_path / "d"), n_buckets=4, **KW
    )
    b = spark.createDataFrame(
        [("r", "p", 1, "s1", "py", False)],
        "repo string, path string, commit_seq long, content_sha256 string, "
        "lang string, is_delete boolean",
    )
    s1 = store.apply_batch(b, source_id="t", batch_id=0)
    s2 = store.apply_batch(b, source_id="t", batch_id=0)
    assert s1["skipped"] is False and s2["skipped"] is True
    assert store.version == 1 and store.history().count() == 1


def test_store_rewrites_only_touched_buckets(spark, tmp_path):
    store = Scd2Store.create(spark, str(tmp_path / "d"), n_buckets=8, **KW)
    schema = (
        "repo string, path string, commit_seq long, content_sha256 string, "
        "lang string, is_delete boolean"
    )
    wide = spark.createDataFrame(
        [(f"r{i}", f"p{i}", i, f"s{i}", "py", False) for i in range(40)], schema
    )
    store.apply_batch(wide, source_id="t", batch_id=0)
    before = dict(store.manifest["buckets"])
    one = spark.createDataFrame([("r0", "p0", 100, "s-new", "py", False)], schema)
    s = store.apply_batch(one, source_id="t", batch_id=1)
    after = store.manifest["buckets"]
    assert s["touched_buckets"] == 1
    changed = [b for b in after if after[b] != before.get(b)]
    assert len(changed) == 1  # every other bucket still points at its old dir
    # and the touched bucket's rows merged: r0 now has 2 versions
    assert store.history().filter("repo = 'r0'").count() == 2


def test_snapshot_at_point_in_time(spark, tmp_path):
    store = Scd2Store.create(spark, str(tmp_path / "d"), n_buckets=4, **KW)
    schema = (
        "repo string, path string, commit_seq long, content_sha256 string, "
        "lang string, is_delete boolean"
    )
    rows = [
        ("r", "p", 10, "v1", "py", False),
        ("r", "p", 20, "v2", "py", False),
        ("r", "p", 30, None, None, True),   # deleted at 30
        ("r", "p", 40, "v3", "py", False),  # reborn
        ("q", "p", 15, "w1", "go", False),
    ]
    store.apply_batch(spark.createDataFrame(rows, schema), source_id="t", batch_id=0)
    def snap(t):
        return {
            (r["repo"], r["content_sha256"])
            for r in store.snapshot_at(t).collect()
        }
    assert snap(12) == {("r", "v1")}
    assert snap(25) == {("r", "v2"), ("q", "w1")}
    assert snap(35) == {("q", "w1")}  # r deleted during [30, 40)
    assert snap(45) == {("r", "v3"), ("q", "w1")}


def test_store_drops_null_key_rows(spark, tmp_path):
    store = Scd2Store.create(spark, str(tmp_path / "d"), n_buckets=4, **KW)
    schema = (
        "repo string, path string, commit_seq long, content_sha256 string, "
        "lang string, is_delete boolean"
    )
    rows = [
        ("r", "p", 1, "s1", "py", False),
        (None, "p", 2, "s2", "py", False),   # null key: dropped, not crashed
        ("r", None, 3, "s3", "py", False),
    ]
    store.apply_batch(spark.createDataFrame(rows, schema), source_id="t", batch_id=0)
    got = store.history().collect()
    assert len(got) == 1 and got[0]["content_sha256"] == "s1"


def test_expire_versions_gc(spark, tmp_path):
    import os

    store = Scd2Store.create(spark, str(tmp_path / "d"), n_buckets=2, **KW)
    schema = (
        "repo string, path string, commit_seq long, content_sha256 string, "
        "lang string, is_delete boolean"
    )
    for i in range(4):
        store.apply_batch(
            spark.createDataFrame([("r", "p", i + 1, f"s{i}", "py", False)], schema),
            source_id="t", batch_id=i,
        )
    data = tmp_path / "d" / "data"
    assert len(os.listdir(data)) == 4  # one dir per commit, 3 now orphaned
    before = _rowset(store.history())
    gc = store.expire_versions(keep_last=1)
    assert gc["removed_dirs"] == 3 and gc["removed_manifests"] == 4
    assert len(os.listdir(data)) == 1
    # current state untouched by GC
    assert _rowset(Scd2Store(spark, str(tmp_path / "d")).history()) == before


def test_cli_dimension_mode(spark, tmp_path):
    """The real CLI surface (python -m ... dimension) in a subprocess —
    main() stops its SparkSession on exit, so it must not share the
    session-scoped test fixture."""
    import json
    import os
    import subprocess
    import sys

    ev = generate_events(spark, 1500, n_repos=6, n_paths=8)
    write_event_log(ev, str(tmp_path / "log"), n_chunks=2)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "PYTHONPATH": repo, "SPARK_GRAFT_CPUS": "4",
           "KMW_DRIVER_MEMORY": "2g"}
    out = subprocess.run(
        [sys.executable, "-m", "kafka_mongo_watcher_spark", "dimension",
         "--log-dir", str(tmp_path / "log"),
         "--dim", str(tmp_path / "dim"),
         "--checkpoint", str(tmp_path / "ckpt"),
         "--n-buckets", "4",
         "--expire-keep-last", "1"],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["mode"] == "dimension"
    assert res["committed"] == 2 and res["version"] == 2
    assert res["removed_dirs"] == 1  # epoch-1 bucket dirs GC'd, keep_last=1
    store = Scd2Store(spark, str(tmp_path / "dim"))
    expect = scd2_history(
        _prepared(spark, tmp_path / "log"),
        key_cols=["repo", "path"], order_col="commit_seq",
        attr_cols=["content_sha256", "lang"], delete_col="is_delete",
    )
    assert _rowset(store.history()) == _rowset(expect)


# ---------------------------------------------------------------------------
# merge-on-read mode
# ---------------------------------------------------------------------------


def test_mor_matches_cow_and_batch_recompute(spark, tmp_path):
    ev = generate_events(spark, 2000, n_repos=8, n_paths=10)
    prepared = transform_events(ev, fingerprint=True).withColumn(
        "is_delete", F.col("op") == "delete"
    )
    bounds = [0, 700, 1400, 2000]
    expect = _rowset(scd2_history(
        prepared, key_cols=["repo", "path"], order_col="commit_seq",
        attr_cols=["content_sha256", "lang"], delete_col="is_delete",
    ))
    store = Scd2Store.create(
        spark, str(tmp_path / "m"), n_buckets=8, write_mode="mor", **KW
    )
    for i in range(3):
        b = prepared.filter(
            (F.col("commit_seq") >= bounds[i]) & (F.col("commit_seq") < bounds[i + 1])
        )
        s = store.apply_batch(b, source_id="t", batch_id=i)
        assert not s["skipped"]
    # pre-compact: resolved read equals the batch recompute
    assert _rowset(store.history()) == expect
    assert any(store.manifest["deltas"].values())
    # compact folds deltas, clears them, and changes NOTHING logically
    c = store.compact()
    assert c["compacted_buckets"] > 0
    assert not any(store.manifest["deltas"].values())
    assert _rowset(store.history()) == expect
    # further applies on the compacted base still converge
    gc = store.expire_versions(keep_last=1)
    assert gc["removed_dirs"] > 0
    assert _rowset(store.history()) == expect


def test_mor_append_only_write_amplification(spark, tmp_path):
    """The MOR promise: a commit writes O(batch) rows, not O(dimension)."""
    import glob
    import os

    store = Scd2Store.create(
        spark, str(tmp_path / "m"), n_buckets=4, write_mode="mor", **KW
    )
    schema = (
        "repo string, path string, commit_seq long, content_sha256 string, "
        "lang string, is_delete boolean"
    )
    wide = spark.createDataFrame(
        [(f"r{i}", "p", i, f"s{i}", "py", False) for i in range(200)], schema
    )
    store.apply_batch(wide, source_id="t", batch_id=0)
    one = spark.createDataFrame([("r0", "p", 999, "s-new", "py", False)], schema)
    store.apply_batch(one, source_id="t", batch_id=1)
    v2_files = glob.glob(os.path.join(str(tmp_path / "m"), "data", "v00000002", "**", "*.parquet"), recursive=True)
    import pyarrow.parquet as pq

    rows_written = sum(pq.ParquetFile(f).metadata.num_rows for f in v2_files)
    # delta = close r0/v1 + open r0/v2 = 2 rows, NOT the 200-row dimension
    assert rows_written == 2
    assert store.history().filter("repo = 'r0'").count() == 2


def _mk_prepared(spark, n, seed_batches):
    ev = generate_events(spark, n, n_repos=8, n_paths=10)
    return transform_events(ev, fingerprint=True).withColumn(
        "is_delete", F.col("op") == "delete"
    )


def test_mor_seed_split_apply_after_compact(spark, tmp_path):
    """Seed-split compaction: `compact` writes per-bucket SEED files (the
    max-version row per key); post-compaction applies fold against
    seeds + new deltas instead of the full version history, and still
    converge to the exact single-shot batch recompute."""
    prepared = _mk_prepared(spark, 2000, 4)
    bounds = [0, 500, 1000, 1500, 2000]
    expect = _rowset(scd2_history(
        prepared, key_cols=["repo", "path"], order_col="commit_seq",
        attr_cols=["content_sha256", "lang"], delete_col="is_delete",
    ))
    store = Scd2Store.create(
        spark, str(tmp_path / "m"), n_buckets=8, write_mode="mor", **KW
    )
    for i in range(2):
        store.apply_batch(prepared.filter(
            (F.col("commit_seq") >= bounds[i]) & (F.col("commit_seq") < bounds[i + 1])
        ), source_id="t", batch_id=i)
    store.compact()
    assert store.manifest["seeds"], "compaction must record seed files"
    # seeds hold one row per key — strictly fewer than the version history
    n_keys = store.history().select("repo", "path").distinct().count()
    n_hist = store.history().count()
    seed_raw = store._read_raw(
        list(range(store.n_buckets)), seeds_only=True
    )
    assert seed_raw.count() == n_keys < n_hist
    # history() never reads seeds: no duplicated rows
    assert store.history().groupBy("repo", "path", "version").count().filter(
        "count > 1"
    ).count() == 0
    # post-compaction batches fold against the seeds and stay exact
    for i in range(2, 4):
        store.apply_batch(prepared.filter(
            (F.col("commit_seq") >= bounds[i]) & (F.col("commit_seq") < bounds[i + 1])
        ), source_id="t", batch_id=i)
    assert _rowset(store.history()) == expect
    # a second compact refreshes the seeds and changes nothing logically
    store.compact()
    assert _rowset(store.history()) == expect


def test_seed_delete_reinsert_across_compaction(spark, tmp_path):
    """A key deleted before compaction leaves a CLOSED seed row; a
    reinsert after compaction must continue version numbering from the
    seed (not restart at 1) and reopen the key."""
    schema = (
        "repo string, path string, commit_seq long, content_sha256 string, "
        "lang string, is_delete boolean"
    )
    store = Scd2Store.create(
        spark, str(tmp_path / "m"), n_buckets=4, write_mode="mor", **KW
    )
    b0 = spark.createDataFrame(
        [("r", "p", 1, "s1", "py", False), ("r", "p", 2, "s2", "py", False),
         ("r", "p", 3, None, None, True)],  # delete closes the key
        schema,
    )
    store.apply_batch(b0, source_id="t", batch_id=0)
    store.compact()
    assert store.manifest["seeds"]
    b1 = spark.createDataFrame([("r", "p", 9, "s9", "go", False)], schema)
    store.apply_batch(b1, source_id="t", batch_id=1)
    rows = {r["version"]: r for r in store.history().filter("repo='r'").collect()}
    assert max(rows) == 3 and rows[3]["is_current"] and rows[3]["lang"] == "go"
    assert rows[2]["valid_to"] is not None  # closed by the delete
    # late event behind the seed's resume point still raises
    late = spark.createDataFrame([("r", "p", 5, "sx", "py", False)], schema)
    with pytest.raises(Exception):
        store.apply_batch(late, source_id="t", batch_id=2).count()


def test_expire_versions_keeps_live_seeds(spark, tmp_path):
    """GC reachability includes the seeds section: after compact + expire
    keep_last=1, the seed dirs referenced by the current manifest survive
    and post-GC applies still fold correctly."""
    import os as _os

    prepared = _mk_prepared(spark, 1000, 2)
    store = Scd2Store.create(
        spark, str(tmp_path / "m"), n_buckets=4, write_mode="mor", **KW
    )
    store.apply_batch(prepared.filter("commit_seq < 500"), source_id="t", batch_id=0)
    store.compact()
    gc = store.expire_versions(keep_last=1)
    assert gc["removed_manifests"] >= 1
    for b, d in store.manifest["seeds"].items():
        assert _os.path.isdir(_os.path.join(store.path, d)), d
    store.apply_batch(prepared.filter("commit_seq >= 500"), source_id="t", batch_id=1)
    expect = _rowset(scd2_history(
        prepared, key_cols=["repo", "path"], order_col="commit_seq",
        attr_cols=["content_sha256", "lang"], delete_col="is_delete",
    ))
    assert _rowset(store.history()) == expect


def test_dimension_stream_compact_every(spark, tmp_path):
    """Streaming maintenance cadence: compact_every=1 folds + reseeds
    after every committed epoch; the final dimension still equals the
    single-shot recompute, deltas stay empty, seeds stay fresh."""
    ev = generate_events(spark, 1500, n_repos=8, n_paths=10)
    write_event_log(ev, str(tmp_path / "log"), n_chunks=3)
    stats = run_dimension_stream(
        spark,
        log_dir=str(tmp_path / "log"),
        dim_path=str(tmp_path / "dim"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=4,
        write_mode="mor",
        compact_every=1,
    )
    assert [s.get("skipped", False) for s in stats] == [False] * 3
    assert all("compacted_buckets" in s for s in stats)
    store = Scd2Store(spark, str(tmp_path / "dim"))
    assert store.manifest["seeds"] and not any(
        store.manifest.get("deltas", {}).values()
    )
    expect = _rowset(scd2_history(
        _prepared(spark, tmp_path / "log"),
        key_cols=["repo", "path"], order_col="commit_seq",
        attr_cols=["content_sha256", "lang"], delete_col="is_delete",
    ))
    assert _rowset(store.history()) == expect
