"""Envelope/transform/filter operators (reference F4-F10, U1-U3)."""

from pyspark.sql import functions as F

from kafka_mongo_watcher_spark.datagen import generate_base_table, generate_events
from kafka_mongo_watcher_spark.operators.envelope import (
    build_insert_envelope,
    debug_payload,
    keep_last_n,
    op_type_filter,
    quarantine_malformed,
    text_search_filter,
    transform_events,
)


def test_insert_envelope_shape(spark):
    """$replaceRoot analog: fixed envelope around each snapshot row
    (replay_producer.go:18-39 golden pipeline)."""
    base = generate_base_table(spark, 300)
    n_rows = base.count()
    for ordering in ("arrival", "key"):
        env = build_insert_envelope(base, ordering=ordering)
        assert set(env.columns) == {
            "partition_id", "offset", "op", "repo", "path", "commit", "lang",
            "content_raw", "commit_seq",
        }
        assert env.filter(F.col("op") != "insert").count() == 0
        # offsets gap-free ascending from 1 PER PARTITION (resume-token
        # contract: per-partition monotone, watch_producer.go:106-134)
        per_part = (
            env.groupBy("partition_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("offset").alias("lo"),
                F.max("offset").alias("hi"),
                F.count_distinct("offset").alias("d"),
            )
            .collect()
        )
        assert sum(r["n"] for r in per_part) == n_rows
        for r in per_part:
            assert (r["lo"], r["hi"], r["d"]) == (1, r["n"], r["n"]), (ordering, r)


def test_insert_envelope_never_single_task(spark, tmp_path):
    """The r2 scale-killer: a global Window over lit(partition_id) funneled
    the ENTIRE snapshot through one task (VERDICT r2 §wrong 2). Guard: over a
    plain parquet scan, the arrival plan has no exchange/window at all (pure
    projection); the key plan's window exchange is hash-partitioned, never
    SinglePartition."""
    generate_base_table(spark, 100).write.parquet(str(tmp_path / "base"))
    base = spark.read.parquet(str(tmp_path / "base"))
    plan_arrival = build_insert_envelope(base, ordering="arrival")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_arrival and "Window" not in plan_arrival
    plan_key = build_insert_envelope(base, ordering="key")._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan_key
    assert "hashpartitioning" in plan_key


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


def test_quarantine_malformed_partitions_batch(spark):
    ev = generate_events(spark, 1500)  # ~1% malformed
    valid, rejects = quarantine_malformed(ev)
    total, n_valid, n_rej = ev.count(), valid.count(), rejects.count()
    assert n_valid + n_rej == total and n_rej > 0
    # split agrees with transform_events' drop filter
    kept = transform_events(ev, fingerprint=False, with_lineage=False)
    assert kept.count() == n_valid
    # reasons are per-column and comma-joined in fixed order
    assert {r.reject_reason for r in rejects.select("reject_reason").distinct().collect()} == {
        "null_repo,null_path"
    }
    # empty-string keys get their own reason
    one = spark.createDataFrame(
        [("", "src/a.py", 1), ("org/r", None, 2)],
        ["repo", "path", "commit_seq"],
    )
    _, rej2 = quarantine_malformed(one)
    got = {r.commit_seq: r.reject_reason for r in rej2.collect()}
    assert got == {1: "empty_repo", 2: "null_path"}
