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
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores=None → $SPARK_GRAFT_CPUS or 32 (sandbox default). master=None →
    $KMW_MASTER or local[cores]. On a single large host prefer
    `local-cluster[4,8,<mem>]` (multiple executor JVMs, 8 cores each): one
    JVM with 32 task threads bottlenecks on process-wide kernel locks
    (mmap/TLB) — measured ~1.9x speedup 8→32 threads in-process vs ~3.5x
    with 4 separate executor JVMs. On a real cluster the master comes from
    spark-submit and none of this applies.
    """
    cores = cores if cores is not None else os.environ.get("SPARK_GRAFT_CPUS", "32")
    n = 32 if cores == "*" else int(cores)
    shuffle = shuffle_partitions if shuffle_partitions is not None else max(n, 8)
    master = master or os.environ.get("KMW_MASTER") or f"local[{cores}]"
    builder = (
        SparkSession.builder.master(master)
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
        # Pre-import pandas/pyarrow in the python-worker daemon: forked
        # workers inherit the modules copy-on-write instead of cold-importing
        # per slot (measured 10-30 s/worker stampede on wide stages —
        # daemon_preload.py).
        .config("spark.python.daemon.module", "kafka_mongo_watcher_spark.daemon_preload")
        .config("spark.python.worker.reuse", "true")
        # The daemon subprocess starts before --py-files land on sys.path, so
        # it needs the package importable from a real path. On a cluster,
        # ship the wheel/zip to a fixed path or bake it into the image.
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.pathsep.join(
                p for p in [
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    os.environ.get("PYTHONPATH", ""),
                ] if p
            ),
        )
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
    if master.startswith("local-cluster["):
        # size executors to the worker spec (local-cluster[n,cores,memMB])
        try:
            mem_mb = int(master.rstrip("]").split(",")[2])
            builder = builder.config("spark.executor.memory", f"{max(mem_mb - 512, 1024)}m")
        except (IndexError, ValueError):
            pass
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
