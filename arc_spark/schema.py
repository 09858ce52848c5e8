"""Arc-schema: schema-as-data (SURVEY.md §1.2).

Parses the reference's schema JSON documents (list of field objects) into
column specs that drive the typing kernel, and converts them to Spark
StructTypes with metadata embedded in each StructField (id, description,
internal flags) — reference: ``schema/ArcSchema.scala:29-120``,
``api/API.scala:121-249`` (type table), ``api/API.scala:151-180``
(toStructField metadata embedding).

Internal-column convention (``util/ExtractUtils.scala:45-52``,
``transform/TypingTransform.scala:413-420``): fields whose metadata has
``internal=true`` (``_filename``, ``_index``, ``_errors``...) are engine-
managed and excluded from typing and equality validation.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import types as T

VALID_TYPES = {
    "string", "integer", "long", "double", "decimal", "boolean",
    "date", "timestamp", "time", "binary", "struct", "array",
}

SPARK_TYPES = {
    "string": T.StringType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    # Arc stores time-of-day as an ISO string (api/API.scala:196-198) —
    # replicated, not "fixed".
    "time": T.StringType(),
    "binary": T.BinaryType(),
}

INTERNAL_COLUMNS = ("_filename", "_index", "_monotonically_increasing_id", "_partition_id", "_errors")


@dataclass
class ColumnSpec:
    name: str
    type: str
    id: str | None = None
    description: str | None = None
    nullable: bool = True
    trim: bool = False
    nullable_values: list[str] = field(default_factory=list)
    null_replacement_value: str | None = None
    metadata: dict = field(default_factory=dict)
    # type-specific knobs
    formatters: list[str] = field(default_factory=list)
    timezone_id: str = "UTC"
    true_values: list[str] = field(default_factory=lambda: ["true"])
    false_values: list[str] = field(default_factory=lambda: ["false"])
    precision: int = 10
    scale: int = 0
    min_length: int | None = None
    max_length: int | None = None
    regex: str | None = None
    encoding: str = "base64"  # binary: base64 | hexadecimal

    def spark_type(self) -> T.DataType:
        if self.type == "decimal":
            return T.DecimalType(self.precision, self.scale)
        if self.type not in SPARK_TYPES:
            raise ValueError(f"unsupported column type {self.type!r} for {self.name!r}")
        return SPARK_TYPES[self.type]

    def to_struct_field(self) -> T.StructField:
        md = dict(self.metadata)
        if self.id is not None:
            md["id"] = self.id
        if self.description is not None:
            md["description"] = self.description
        md.setdefault("internal", False)
        return T.StructField(self.name, self.spark_type(), self.nullable, metadata=md)


_KEY_MAP = {
    "nullableValues": "nullable_values",
    "nullReplacementValue": "null_replacement_value",
    "timezoneId": "timezone_id",
    "trueValues": "true_values",
    "falseValues": "false_values",
    "minLength": "min_length",
    "maxLength": "max_length",
}

_IGNORED_KEYS = {"internal", "strict", "caseSensitive", "time", "table", "primaryKey"}


def parse_arc_schema(doc: str | list) -> list[ColumnSpec]:
    """Parse an Arc-schema JSON document (string or parsed list)."""
    if isinstance(doc, str):
        doc = json.loads(doc)
    if not isinstance(doc, list):
        raise ValueError("Arc schema must be a JSON array of field objects")
    specs = []
    errors = []
    for i, f_ in enumerate(doc):
        try:
            specs.append(_parse_field(f_))
        except Exception as e:  # accumulate all errors (config/Plugins.scala:32-143)
            errors.append(f"field[{i}]: {e}")
    if errors:
        raise ValueError("invalid Arc schema:\n  " + "\n  ".join(errors))
    return specs


def _parse_field(f_: dict) -> ColumnSpec:
    if "name" not in f_:
        raise ValueError("missing 'name'")
    if "type" not in f_:
        raise ValueError(f"{f_.get('name')!r}: missing 'type'")
    t = f_["type"]
    if t not in VALID_TYPES:
        raise ValueError(f"{f_['name']!r}: unknown type {t!r} (valid: {sorted(VALID_TYPES)})")
    kwargs: dict = {"name": f_["name"], "type": t}
    for k, v in f_.items():
        if k in ("name", "type") or k in _IGNORED_KEYS:
            continue
        key = _KEY_MAP.get(k, k)
        if key in ColumnSpec.__dataclass_fields__:
            kwargs[key] = v
        else:
            raise ValueError(f"{f_['name']!r}: unknown key {k!r}")
    return ColumnSpec(**kwargs)


def parse_arc_schema_dataframe(df) -> list[ColumnSpec]:
    """Schema-as-data: build ColumnSpecs from a DataFrame whose rows are
    field definitions (reference: ``schema/ArcSchema.scala:25-27``
    parseArcSchemaDataFrame — schemas can be produced by earlier stages).

    Expected columns: ``name``, ``type`` (required); any other column whose
    name matches an Arc schema key is applied; a ``metadata`` column may
    hold a JSON object string.
    """
    # Spark simpleString -> Arc type names, so MetadataExtract output (a
    # reified Spark schema) round-trips directly into an extract schemaView
    simple_to_arc = {
        "int": "integer", "smallint": "integer", "tinyint": "integer",
        "bigint": "long", "float": "double",
    }
    rows = [r.asDict() for r in df.collect()]
    fields = []
    for r in rows:
        f_: dict = {}
        for k, v in r.items():
            if v is None:
                continue
            if k == "metadata" and isinstance(v, str):
                v = json.loads(v)
            if k == "type" and isinstance(v, str):
                if v.startswith("decimal("):
                    p, s = v[8:-1].split(",")
                    f_["precision"], f_["scale"] = int(p), int(s)
                    v = "decimal"
                else:
                    v = simple_to_arc.get(v, v)
            f_[k] = v
        fields.append(f_)
    return parse_arc_schema(fields)


def to_struct_type(specs: list[ColumnSpec]) -> T.StructType:
    return T.StructType([s.to_struct_field() for s in specs])


def errors_field() -> T.StructField:
    """The _errors internal column (transform/TypingTransform.scala:413-420)."""
    return T.StructField(
        "_errors",
        T.ArrayType(
            T.StructType(
                [
                    T.StructField("field", T.StringType(), True),
                    T.StructField("message", T.StringType(), True),
                ]
            ),
            False,
        ),
        True,
        metadata={"internal": True},
    )


def empty_df(spark, schema):
    """EMPTY DataFrame with ``schema`` (StructType or DDL), cheap to
    consume.

    ``spark.createDataFrame([], schema)`` is backed by an empty PYTHON
    RDD with ``defaultParallelism`` partitions: every stage consuming it
    runs that many no-op tasks, and each task spins up (or waits on) a
    Python worker — measured ~1.1 s/task cold on the replay's epoch-0
    empty-base read. A ZERO-partition RDD keeps the declared schema
    byte-exact (nullability and field metadata included — a typed-empty
    extract must introspect identically to a non-empty read) while every
    consumer stage over it schedules zero tasks and touches no Python
    worker."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    return spark.createDataFrame(spark.sparkContext.emptyRDD(), schema)
