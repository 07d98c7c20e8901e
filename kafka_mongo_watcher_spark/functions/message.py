"""Keyed message emission — the reference's actual output contract.

The watcher's product is a stream of Kafka messages: key = the document id
bytes, value = the change event marshalled to canonical JSON with a FIXED
field order, plus tracing headers
(/root/reference/internal/mongo/transformer.go:25-37,
 /root/reference/internal/kafka/model.go:4-15,
 /root/reference/internal/kafka/client_tracer.go:13,42-53).

`to_message` is that contract as a Spark projection: one JVM-side
`to_json(struct(...))` per event — no Python, no shuffle, safe to chain onto
any event DataFrame (batch or streaming) and write to a Kafka sink
(`df.selectExpr("key", "value").writeStream.format("kafka")`) or any
key/value store. Field order inside the JSON follows the reference
ChangeEvent declaration order (event.go:17-28): _id, operationType,
fullDocument, documentKey, clusterTime — with ignoreNullFields=false so the
byte layout is stable for golden comparison (transformer_test.go:44-52
asserts exact bytes; tests/test_message.py mirrors that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# key separator: documentKey (repo, path) → one opaque id string. \x1f (unit
# separator) cannot appear in either column per the engine's key contract.
KEY_SEP = "\x1f"
X_TRACING = "x-tracing"  # client_tracer.go:13

JSON_OPTS = {"ignoreNullFields": "false"}


def message_key(repo=None, path=None):
    """documentID analog (event.go:36-42): the Kafka message key. Same key →
    same partition → per-document total order downstream."""
    return F.concat_ws(
        KEY_SEP,
        repo if repo is not None else F.col("repo"),
        path if path is not None else F.col("path"),
    )


def to_message(
    events: DataFrame,
    *,
    topic: str = "kmw-events",
    app_name: str = "kmw-spark",
    include_tracing: bool = True,
    keep_ordering_cols: bool = False,
) -> DataFrame:
    """Event rows → (topic, key, value, headers) message rows.

    - rows whose documentKey is null/empty are SKIPPED, not failed — the
      transformer's error-tolerance semantics (transformer.go:19-23, F8);
    - `value` is canonical JSON with the reference's field order and
      null-preserving layout (event.go:17-33 marshal);
    - `headers` carries the x-tracing analog (client_tracer.go:42-53) as
      (key, value) string pairs;
    - `keep_ordering_cols=True` retains (partition_id, offset, commit_seq)
      for sinks that need them (the streaming message sink sorts each
      topic-partition file by them; a real Kafka sink would drop them).
    """
    df = events.filter(
        F.col("repo").isNotNull()
        & (F.col("repo") != "")
        & F.col("path").isNotNull()
        & (F.col("path") != "")
    )
    content = F.col("content_raw") if "content_raw" in df.columns else F.col("content")
    envelope = F.struct(
        F.struct(
            F.col("partition_id").alias("partition_id"),
            F.col("offset").alias("offset"),
        ).alias("_id"),  # resume-token analog of ChangeEvent._id
        F.col("op").alias("operationType"),
        F.struct(
            F.col("commit").alias("commit"),
            (F.col("lang") if "lang" in df.columns else F.lit(None).cast("string")).alias("lang"),
            content.alias("content"),
        ).alias("fullDocument"),
        F.struct(F.col("repo").alias("repo"), F.col("path").alias("path")).alias(
            "documentKey"
        ),
        F.col("commit_seq").alias("clusterTime"),
    )
    out = df.select(
        F.lit(topic).alias("topic"),
        message_key().alias("key"),
        F.to_json(envelope, JSON_OPTS).alias("value"),
        F.col("partition_id"),
        F.col("offset"),
        F.col("commit_seq"),
    )
    headers = (
        F.array(
            F.struct(
                F.lit(X_TRACING).alias("key"),
                F.to_json(
                    F.struct(
                        F.lit(app_name).alias("app"),
                        F.col("partition_id").alias("src_partition"),
                        F.col("offset").alias("src_offset"),
                    ),
                    JSON_OPTS,
                ).alias("value"),
            )
        )
        if include_tracing
        else F.array().cast("array<struct<key:string,value:string>>")
    )
    out = out.withColumn("headers", headers)
    if keep_ordering_cols:
        return out
    return out.drop("partition_id", "offset", "commit_seq")
