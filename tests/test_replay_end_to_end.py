"""End-to-end batch replay vs the sequential oracle — the golden-state test
(reference TestMainModeReplay, /root/reference/cmd/watcher/main_test.go:41-69).
"""

from pyspark.sql import functions as F

from kafka_mongo_watcher_spark.datagen import generate_events, write_event_log
from kafka_mongo_watcher_spark.operators.envelope import (
    build_insert_envelope,
    transform_events,
)
from kafka_mongo_watcher_spark.oracle import oracle_rows
from kafka_mongo_watcher_spark.plans.lake import LakeTable
from kafka_mongo_watcher_spark.sources.events import read_event_log

FINAL_COLS = ["repo", "path", "commit", "lang", "content_sha256"]


def _engine_state(table):
    return {tuple(r) for r in table.snapshot().select(*FINAL_COLS).collect()}


def test_single_batch_replay_matches_oracle(spark, tmp_path):
    ev = generate_events(spark, 3000)
    rows = [r.asDict() for r in ev.collect()]
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=8)
    t.merge(transform_events(ev), source_id="replay", batch_id=0)
    assert _engine_state(t) == oracle_rows(rows)


def test_multi_batch_replay_matches_oracle(spark, tmp_path):
    """Chunked apply in order — the watch-mode micro-batch sequence
    (TestMainModeWatch analog)."""
    ev = generate_events(spark, 4000)
    rows = [r.asDict() for r in ev.collect()]
    dirs = write_event_log(ev, str(tmp_path / "log"), n_chunks=4)
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=8)
    for i, d in enumerate(dirs):
        chunk = read_event_log(spark, d)
        t.merge(transform_events(chunk), source_id="watch", batch_id=i)
    assert _engine_state(t) == oracle_rows(rows)


def test_malformed_events_skipped_not_fatal(spark, tmp_path):
    """Null-key rows dropped, batch commits (reference transformer.go:19-23,
    replay_producer.go:71-74 skip semantics)."""
    ev = generate_events(spark, 2000, malformed_per_mille=100)
    n_bad = ev.filter(F.col("repo").isNull()).count()
    assert n_bad > 0
    rows = [r.asDict() for r in ev.collect()]
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=8)
    stats = t.merge(transform_events(ev), source_id="s", batch_id=0)
    assert not stats["skipped"]
    assert _engine_state(t) == oracle_rows(rows)


def test_snapshot_replay_envelope_matches_base_table(spark, tmp_path):
    """Replay mode: base table → synthetic insert envelopes → apply to an
    empty table reproduces the base table (replay_producer.go:17-67)."""
    from kafka_mongo_watcher_spark.datagen import generate_base_table

    base = generate_base_table(spark, 800)
    env = build_insert_envelope(base)
    assert env.filter(F.col("op") != "insert").count() == 0
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=8)
    t.merge(transform_events(env), source_id="replay", batch_id=0)
    want = {
        (r["repo"], r["path"], r["commit"])
        for r in base.select("repo", "path", "commit").collect()
    }
    got = {
        (r["repo"], r["path"], r["commit"])
        for r in t.snapshot().select("repo", "path", "commit").collect()
    }
    assert got == want


def test_lineage_metrics_per_partition(spark, tmp_path):
    ev = generate_events(spark, 2000, n_partitions=4)
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=8)
    stats = t.merge(transform_events(ev), source_id="s", batch_id=0)
    lineage = stats["lineage"]
    assert set(lineage) == {"0", "1", "2", "3"}
    assert sum(v["events"] for v in lineage.values()) == transform_events(ev).count()
    # high-water offsets persisted in the manifest (resume-token bookkeeping)
    assert t.manifest["lineage"] == lineage
