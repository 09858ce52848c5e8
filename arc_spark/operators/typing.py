"""TypingTransform — schema-driven string→typed coercion with per-cell
error capture.

Reference parity: ``transform/TypingTransform.scala`` (value semantics
truth table :342-360, Typeable instances :424-941, _errors assembly
:413-420). The reference maps row-by-row on the JVM with a RowEncoder;
re-expressing each coercion as a Catalyst column expression keeps the
whole transform inside whole-stage codegen — no Python, no row loop, and
Catalyst can prune/reorder it (SURVEY.md §2.2 calls this the one operator
that needs real reimplementation).

Truth table per cell (matching the reference):
  raw NULL or in nullableValues → nullReplacementValue if set, else NULL;
      NULL result for a non-nullable column ⇒ error
  parse success → typed value
  parse failure → NULL + error struct {field, message} appended to _errors
      (permissive mode) / stage failure (failfast — checked by the stage)

All parses use null-on-failure forms (try_cast / try_to_timestamp /
guarded unbase64) so they are ANSI-mode safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arc_spark.schema import ColumnSpec

_ERR_MSG = {
    "integer": "unable to convert to integer",
    "long": "unable to convert to long",
    "double": "unable to convert to double",
    "decimal": "unable to convert to decimal",
    "boolean": "unable to convert to boolean",
    "date": "unable to convert to date",
    "timestamp": "unable to convert to timestamp",
    "time": "unable to convert to time",
    "binary": "unable to convert to binary",
    "string": "string validation failed",
}


def _parse(effective: Column, spec: ColumnSpec) -> Column:
    t = spec.type
    if t == "string":
        checks = F.lit(True)
        if spec.min_length is not None:
            checks = checks & (F.length(effective) >= spec.min_length)
        if spec.max_length is not None:
            checks = checks & (F.length(effective) <= spec.max_length)
        if spec.regex:
            checks = checks & effective.rlike(spec.regex)
        return F.when(checks, effective)
    if t in ("integer", "long", "double"):
        cleaned = effective
        if spec.formatters:
            # DecimalFormat-style grouping: strip grouping separators
            cleaned = F.regexp_replace(effective, r"[,\s]", "")
        return cleaned.try_cast(t)
    if t == "decimal":
        return effective.try_cast(f"decimal({spec.precision},{spec.scale})")
    if t == "boolean":
        lowered = effective
        return (
            F.when(lowered.isin(spec.true_values), F.lit(True))
            .when(lowered.isin(spec.false_values), F.lit(False))
            .otherwise(F.lit(None).cast("boolean"))
        )
    if t == "date":
        fmts = spec.formatters or ["yyyy-MM-dd"]
        return F.coalesce(
            *[F.try_to_timestamp(effective, F.lit(f)).cast("date") for f in fmts]
        )
    if t == "timestamp":
        fmts = spec.formatters or ["yyyy-MM-dd HH:mm:ss"]
        parsed = F.coalesce(*[F.try_to_timestamp(effective, F.lit(f)) for f in fmts])
        if spec.timezone_id and spec.timezone_id != "UTC":
            # interpret the wall-clock in timezone_id (session tz is UTC)
            parsed = F.to_utc_timestamp(parsed, spec.timezone_id)
        return parsed
    if t == "time":
        # Arc keeps time-of-day as ISO_LOCAL_TIME string (api/API.scala:196-198)
        return F.when(effective.rlike(r"^\d{2}:\d{2}:\d{2}$"), effective)
    if t == "binary":
        if spec.encoding == "hexadecimal":
            return F.when(
                effective.rlike("^([0-9a-fA-F]{2})+$"), F.unhex(effective)
            )
        return F.when(
            effective.rlike("^[A-Za-z0-9+/\\s]*={0,2}$"), F.unbase64(effective)
        )
    raise ValueError(f"unsupported type {t!r}")


def typing_transform(
    df: DataFrame,
    specs: list[ColumnSpec],
    *,
    keep_unmatched: bool = True,
) -> DataFrame:
    """Coerce string columns of ``df`` per ``specs``; append ``_errors``.

    Columns in ``df`` not covered by specs pass through when
    ``keep_unmatched`` (internal ``_``-prefixed columns always pass
    through untouched, per the reference's internal-column exclusion,
    TypingTransform.scala:181-183).
    """
    spec_names = {s.name for s in specs}
    out_cols: list[Column] = []
    err_exprs: list[Column] = []

    for spec in specs:
        if spec.name not in df.columns:
            raise ValueError(f"typing: column {spec.name!r} not in input")
        raw = F.col(spec.name).cast("string")
        if spec.trim:
            raw = F.trim(raw)
        nullish = raw.isNull()
        if spec.nullable_values:
            nullish = nullish | raw.isin(spec.nullable_values)
        if spec.null_replacement_value is not None:
            effective = F.when(nullish, F.lit(spec.null_replacement_value)).otherwise(raw)
        else:
            effective = F.when(~nullish, raw)

        parsed = _parse(effective, spec)
        parse_failed = effective.isNotNull() & parsed.isNull()
        null_violation = F.lit(not spec.nullable) & parsed.isNull() & ~parse_failed

        msg = _ERR_MSG[spec.type]
        err = (
            F.when(
                parse_failed,
                F.struct(
                    F.lit(spec.name).alias("field"),
                    F.concat(
                        F.lit(f"{spec.name}: {msg}: '"), effective, F.lit("'")
                    ).alias("message"),
                ),
            )
            .when(
                null_violation,
                F.struct(
                    F.lit(spec.name).alias("field"),
                    F.lit(f"{spec.name}: null for non-nullable column").alias("message"),
                ),
            )
        )
        err_exprs.append(err)
        md = spec.to_struct_field().metadata
        out_cols.append(parsed.alias(spec.name, metadata=md))

    if keep_unmatched:
        for c in df.columns:
            if c not in spec_names and c != "_errors":
                out_cols.append(F.col(c))

    errors_arr = F.filter(F.array(*err_exprs), lambda x: x.isNotNull())
    return df.select(*out_cols, errors_arr.alias("_errors", metadata={"internal": True}))


def error_rate(df: DataFrame) -> float:
    """Fraction of rows with ≥1 typing error — the SQLValidate error-gate
    input (conf/sql/customer_error_threshold.sql pattern)."""
    row = df.agg(
        F.count_if(F.size("_errors") > 0).alias("bad"), F.count(F.lit(1)).alias("n")
    ).first()
    return (row["bad"] / row["n"]) if row["n"] else 0.0
