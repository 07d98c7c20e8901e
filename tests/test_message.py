"""Keyed message emission: golden byte-equality with the reference's
marshalling contract (transformer_test.go:40-52 asserts exact key/value
bytes; we assert exact JSON strings for our envelope), skip semantics, and
tracing headers."""

import json

from pyspark.sql import functions as F

from kafka_mongo_watcher_spark.functions.message import (
    KEY_SEP,
    X_TRACING,
    message_key,
    to_message,
)

EVENT_COLS = (
    "partition_id int, offset bigint, op string, repo string, path string, "
    "commit string, lang string, content_raw string, commit_seq bigint"
)


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENT_COLS)


def test_golden_message_bytes(spark):
    """Exact key and value bytes for two events — the transformer_test.go
    golden-equality analog."""
    rows = [
        (0, 1, "insert", "org/repo", "src/a.py", "c0ffee", "py", "print(1)\n", 10),
        (1, 2, "update", "org/repo", "src/b.go", "deadbe", None, 'x := "q"', 11),
    ]
    got = to_message(_events(spark, rows), topic="my-test-topic").orderBy("key").collect()

    assert got[0]["topic"] == "my-test-topic"
    assert got[0]["key"] == "org/repo" + KEY_SEP + "src/a.py"
    assert got[0]["value"] == (
        '{"_id":{"partition_id":0,"offset":1},"operationType":"insert",'
        '"fullDocument":{"commit":"c0ffee","lang":"py","content":"print(1)\\n"},'
        '"documentKey":{"repo":"org/repo","path":"src/a.py"},"clusterTime":10}'
    )
    # null field preserved (ignoreNullFields=false), quotes escaped
    assert got[1]["key"] == "org/repo" + KEY_SEP + "src/b.go"
    assert got[1]["value"] == (
        '{"_id":{"partition_id":1,"offset":2},"operationType":"update",'
        '"fullDocument":{"commit":"deadbe","lang":null,"content":"x := \\"q\\""},'
        '"documentKey":{"repo":"org/repo","path":"src/b.go"},"clusterTime":11}'
    )


def test_message_value_is_valid_json_roundtrip(spark):
    rows = [(0, 1, "replace", "r", "p", "c", "md", 'line1\r\nline2 "quoted"', 5)]
    v = json.loads(to_message(_events(spark, rows)).first()["value"])
    assert v["operationType"] == "replace"
    assert v["documentKey"] == {"repo": "r", "path": "p"}
    assert v["fullDocument"]["content"] == 'line1\r\nline2 "quoted"'
    assert v["clusterTime"] == 5


def test_empty_document_key_rows_skipped_not_failed(spark):
    """transformer.go:19-23: a message without a document id is skipped and
    the stream continues."""
    rows = [
        (0, 1, "insert", "r", "p", "c", "py", "x", 1),
        (0, 2, "insert", None, "p", "c", "py", "x", 2),
        (0, 3, "insert", "r", "", "c", "py", "x", 3),
    ]
    out = to_message(_events(spark, rows)).collect()
    assert len(out) == 1 and out[0]["key"].startswith("r" + KEY_SEP)


def test_tracing_header_present_and_json(spark):
    """client_tracer.go:42-53: the x-tracing header rides every message."""
    rows = [(3, 7, "insert", "r", "p", "c", "py", "x", 1)]
    msg = to_message(_events(spark, rows), app_name="my-app").first()
    headers = {h["key"]: h["value"] for h in msg["headers"]}
    tr = json.loads(headers[X_TRACING])
    assert tr == {"app": "my-app", "src_partition": 3, "src_offset": 7}
    no_tr = to_message(_events(spark, rows), include_tracing=False).first()
    assert no_tr["headers"] == []


def test_message_key_partitions_consistently_with_lake_buckets(spark):
    """Same key function downstream of both paths: messages for a key land
    with the table bucket of that key (kafka/client.go:29-31 hash-partition
    analog)."""
    rows = [(0, i, "insert", f"r{i % 3}", "p", "c", "py", "x", i) for i in range(9)]
    df = to_message(_events(spark, rows))
    keys = {r["key"] for r in df.select("key").collect()}
    assert keys == {f"r{j}" + KEY_SEP + "p" for j in range(3)}


def test_message_key_expression_matches_helper(spark):
    df = spark.createDataFrame([("a", "b")], "repo string, path string")
    assert df.select(message_key().alias("k")).first()["k"] == "a" + KEY_SEP + "b"
