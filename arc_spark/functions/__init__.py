from arc_spark.functions.udfs import register_udfs  # noqa: F401
