from arc_spark.streaming.replay import StreamingReplay  # noqa: F401
