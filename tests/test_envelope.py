"""Envelope/transform/filter operators (reference F4-F10, U1-U3)."""

from pyspark.sql import functions as F

from kafka_mongo_watcher_spark.datagen import generate_base_table, generate_events
from kafka_mongo_watcher_spark.operators.envelope import (
    build_insert_envelope,
    debug_payload,
    keep_last_n,
    op_type_filter,
    text_search_filter,
    transform_events,
)


def test_insert_envelope_shape(spark):
    """$replaceRoot analog: fixed envelope around each snapshot row
    (replay_producer.go:18-39 golden pipeline)."""
    base = generate_base_table(spark, 300)
    env = build_insert_envelope(base, partition_id=3)
    assert set(env.columns) == {
        "partition_id", "offset", "op", "repo", "path", "commit", "lang",
        "content_raw", "commit_seq",
    }
    rows = env.orderBy("offset").limit(3).collect()
    assert all(r["op"] == "insert" and r["partition_id"] == 3 for r in rows)
    # offsets gap-free ascending from 1 (resume-token contract)
    offs = [r["offset"] for r in rows]
    assert offs == [1, 2, 3]


def test_transform_drops_malformed_and_fingerprints(spark):
    ev = generate_events(spark, 1500, malformed_per_mille=100)
    out = transform_events(ev)
    assert out.filter(F.col("repo").isNull() | F.col("path").isNull()).count() == 0
    r = out.filter(F.col("op") != "delete").limit(1).collect()[0]
    assert len(r["content_sha256"]) == 64
    assert r["lineage"]["app"] == "kmw-spark"  # x-tracing header analog (F9)
    assert r["lineage"]["src_offset"] == r["offset"]


def test_debug_payload_update_vs_insert(spark):
    ev = transform_events(generate_events(spark, 1000))
    dbg = debug_payload(ev)
    upd = dbg.filter(F.col("op") == "update").limit(1).collect()[0]
    ins = dbg.filter(F.col("op") == "insert").limit(1).collect()[0]
    assert upd["payload"] == upd["content_sha256"]
    assert ins["payload"] == ins["content"]


def test_text_search_and_op_filters(spark):
    ev = transform_events(generate_events(spark, 1000))
    hot = text_search_filter(ev, "hot-repo", cols=("repo", "path"))
    assert hot.filter(~F.col("repo").contains("hot-repo")).count() == 0
    ins = op_type_filter(ev, "insert")
    assert ins.select("op").distinct().collect()[0]["op"] == "insert"


def test_keep_last_n(spark):
    ev = generate_events(spark, 1000)
    last = keep_last_n(ev, 50).collect()
    assert len(last) == 50
    max_seq = ev.agg(F.max("commit_seq")).first()[0]
    assert max(r["commit_seq"] for r in last) == max_seq
    assert min(r["commit_seq"] for r in last) > max_seq - 200
