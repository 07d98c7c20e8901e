"""SparkSession bootstrap for the CDC engine.

Local-mode tuned; on a real cluster the same builder is used with master
unset (taken from spark-submit) and shuffle partitions sized to the
cluster (~2-3x total cores). AQE stays on everywhere: it handles runtime
partition coalescing and skew-join splitting on top of our explicit
salting (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def spark_session(
    app_name: str = "kmw-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores=None → $SPARK_GRAFT_CPUS or 32 (sandbox default). On a real
    cluster, pass cores="*" only for the driver-local tools; the engine
    itself never assumes local mode.
    """
    cores = cores if cores is not None else os.environ.get("SPARK_GRAFT_CPUS", "32")
    n = 32 if cores == "*" else int(cores)
    shuffle = shuffle_partitions if shuffle_partitions is not None else max(n, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("KMW_DRIVER_MEMORY", "16g"))
    )
    # Single-host sandbox: shuffle + spill through one disk serializes at
    # high thread counts; use RAM-backed local dirs when available. On a
    # real cluster this is per-node NVMe and spark.local.dir is left alone.
    shm = os.environ.get("KMW_LOCAL_DIR", "/dev/shm/kmw-spark-local")
    try:
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    except OSError:
        pass
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
