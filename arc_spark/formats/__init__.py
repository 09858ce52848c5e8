from arc_spark.formats.avro import (  # noqa: F401
    avro_to_spark_type,
    read_ocf_bytes,
    read_ocf_schema,
    spark_to_avro_schema,
    write_ocf_bytes,
)
