"""Lineage & metrics emission.

The reference's observability chain (SURVEY.md §2.4): per-topic produce
counters (/root/reference/internal/metrics/kafka.go:26-90), logging taps and
the SSE debug feed. Spark analogs here:
  - `observe_events` — df.observe() named aggregates riding the batch plan
    (no extra job): total/malformed counts, max offset.
  - per-partition lineage comes back from every LakeTable.merge (events +
    max_offset per source partition) and is persisted in the manifest.
  - `MetricsLog` — JSON-lines sink for merge stats (the Prometheus-counter
    analog, queryable after the run).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def observe_events(df: DataFrame, name: str = "kmw_metrics") -> DataFrame:
    return df.observe(
        name,
        F.count(F.lit(1)).alias("events"),
        F.sum(
            (F.col("repo").isNull() | F.col("path").isNull()).cast("long")
        ).alias("malformed"),
        F.max("offset").alias("max_offset"),
    )


def partition_lineage(df: DataFrame) -> DataFrame:
    """Per-source-partition event counts + high-water offset (the required
    lineage metric)."""
    return df.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("events"),
        F.max("offset").alias("max_offset"),
        F.max("commit_seq").alias("max_commit_seq"),
    )


class MetricsLog:
    """Append-only JSON-lines metrics sink."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def emit(self, record: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=str) + "\n")

    def read(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]
