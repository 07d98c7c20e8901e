from kafka_mongo_watcher_spark.sources.events import (  # noqa: F401
    EVENT_SCHEMA_DDL,
    event_schema,
    read_event_log,
    stream_event_log,
)
from kafka_mongo_watcher_spark.sources.lake_changes import (  # noqa: F401
    LakeChangesDataSource,
)
