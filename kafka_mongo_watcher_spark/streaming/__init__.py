from kafka_mongo_watcher_spark.streaming.run import run_replay_stream  # noqa: F401
