"""arc_spark — a from-scratch PySpark-native CDC / incremental-ingest engine
with the query and data-processing capabilities of tripl-ai/arc.

Not a port: the reference (Scala, /root/reference) tells us WHAT to compute;
this package expresses it Spark-first — declarative DataFrame/SQL plans that
Catalyst/Tungsten optimize, Arrow-vectorized pandas UDFs where Python is
unavoidable, and explicit partitioning/salting where scale demands it.

Layout
------
- ``arc_spark.session``    Spark session builder (AQE on, tuned shuffle).
- ``arc_spark.pipeline``   Arc-style config-driven stage DAG + interpreter.
- ``arc_spark.schema``     Arc-schema JSON -> StructType + typing rules.
- ``arc_spark.cdc``        change-event generator, LWW apply kernel, replay
                           runner, brute-force reference replay (oracle).
- ``arc_spark.lake``       Iceberg-style snapshot/manifest lake table with
                           bucketed copy-on-write MERGE, schema evolution,
                           exactly-once commits (offsets live in the snapshot).
- ``arc_spark.operators``  transforms: typing, sql, diff, similarity join,
                           statistics, validation, dedup, text analysis, knn.
- ``arc_spark.sources``    extracts (delimited/json/parquet/orc/avro/text/
                           bytes/rate/...).
- ``arc_spark.sinks``      loads (parquet/orc/json/delimited/avro/text/
                           console/lake).
"""

__version__ = "0.1.0"
