"""Bootstrap helpers: create the lake table whose schema matches the
change-stream row shape (minus the op column, plus the fingerprint)."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructField, StructType, StringType

from arc_spark.lake.table import LakeTable, Snapshot


def create_table_for_stream(
    spark: SparkSession,
    events_path: str | list[str],
    table_root: str,
    *,
    key_cols: list[str] = ("repo", "path"),
    seq_col: str = "seq",
    num_buckets: int = 32,
    fingerprint: bool = True,
    drop_cols: tuple[str, ...] = ("op",),
    overwrite: bool = True,
    events_format: str = "parquet",
    payload_schema=None,
) -> tuple[LakeTable, Snapshot]:
    if events_format == "debezium":
        # the table shape is the parsed envelope's canonical frame:
        # payload columns + seq (op is dropped below like any stream)
        from pyspark.sql.types import LongType

        from arc_spark.cdc.debezium import _payload_struct

        if payload_schema is None:
            raise ValueError("events_format='debezium' requires payload_schema")
        stream_schema = StructType(
            [*_payload_struct(payload_schema).fields,
             StructField(seq_col, LongType(), True)]
        )
    else:
        paths = (
            list(events_path)
            if isinstance(events_path, (list, tuple))
            else [events_path]
        )
        stream_schema = spark.read.option("mergeSchema", "true").parquet(*paths).schema
    fields = [f for f in stream_schema.fields if f.name not in drop_cols]
    if fingerprint and "content_sha256" not in {f.name for f in fields}:
        fields.append(StructField("content_sha256", StringType(), True))
    table = LakeTable(table_root)
    snap = table.create(
        StructType(fields),
        list(key_cols),
        seq_col=seq_col,
        num_buckets=num_buckets,
        overwrite=overwrite,
    )
    return table, snap
