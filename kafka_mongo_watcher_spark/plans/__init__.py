from kafka_mongo_watcher_spark.plans.lake import LakeTable  # noqa: F401
