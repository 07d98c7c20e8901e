"""Python worker daemon with the heavy libraries pre-imported.

Spark's python daemon (`pyspark.daemon`) forks a fresh worker per task slot;
each forked worker then imports pandas/numpy/pyarrow on first UDF evaluation.
Under a wide stage every slot forks and cold-imports simultaneously — a
thundering herd that we measured at 10-30 s of `time to initialize Python
workers` PER TASK on a 32-slot node (the imports contend for CPU and page
cache). Importing the libraries in the daemon parent instead means every
forked worker inherits the fully-initialized modules via copy-on-write
memory: worker init drops to fork()+handshake (~10 ms).

Enable with:
    spark.python.daemon.module=kafka_mongo_watcher_spark.daemon_preload

This is the engine-side analog of the reference keeping one long-lived
producer process instead of re-spawning per message
(/root/reference/internal/kafka/client.go:25-36).
"""

# Heavy imports first — order matters: numpy before pandas is marginally
# faster, pyarrow last (pulls numpy).
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401
import pyarrow.compute  # noqa: F401

# Stdlib used by the engine's UDFs — cheap, but saves per-fork work too.
import hashlib  # noqa: F401
import unicodedata  # noqa: F401

# Pre-import the engine's UDF modules so cloudpickle-deserialized UDFs find
# their globals already materialized in the child.
try:  # py-files zip may not include the package in exotic setups
    import kafka_mongo_watcher_spark.functions.content  # noqa: F401
    import kafka_mongo_watcher_spark.functions.multimodal  # noqa: F401
    import kafka_mongo_watcher_spark.functions.text  # noqa: F401
except Exception:  # pragma: no cover - optional
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
