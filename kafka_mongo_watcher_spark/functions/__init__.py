from kafka_mongo_watcher_spark.functions.content import (  # noqa: F401
    normalize_and_fingerprint,
    normalize_content_py,
    sha256_hex_py,
)
