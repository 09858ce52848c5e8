"""As-of (most-recent-event) join — an operator Spark lacks natively.

``asof_join(left, right, keys, left_time, right_time)``: for each left
row, attach the right row with the same keys and the greatest
``right_time <= left_time`` (backward as-of, the time-series standard).

Implementation is the merge-style union trick, NOT a range join:
union the two inputs tagged by side, sort within key by (time, side) with
right-before-left on ties, and carry the last-seen right payload forward
with ``last(..., ignorenulls=True)`` over an unbounded-preceding window.

Scale rationale: one shuffle on the key columns and one in-partition sort
— O((L+R) log) per key group, versus the O(L·R) blowup of the naive
``l.time >= r.time`` range join that Catalyst would plan as a broadcast
nested loop. Skewed keys degrade to a big sort, not a cross product.

(Not in the reference — SURVEY.md §2.6 notes it has no as-of/interval
join; included as part of the engine's training-data operator family.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: list[str],
    left_time: str,
    right_time: str,
    right_prefix: str = "r_",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of left join. Right columns (except keys) come back
    prefixed with ``right_prefix``; unmatched left rows keep them null.

    ``tolerance_seconds``: if set, matches older than the tolerance are
    nulled (pandas ``merge_asof(tolerance=...)`` semantics).
    """
    from pyspark.sql import types as T

    l_payload = [c for c in left.columns if c not in keys and c != left_time]
    r_payload = [c for c in right.columns if c not in keys]

    # The matched right row is carried as ONE struct (time + payload), not
    # per-column last(ignorenulls): per-column carry would stitch values
    # from DIFFERENT right rows whenever the matched row has a legit NULL
    # payload column (an older row's non-null value would leak through,
    # and the tolerance check would compare against the wrong row's time).
    r_struct_type = T.StructType(
        [T.StructField("_rt", right.schema[right_time].dataType)]
        + [T.StructField(f"{right_prefix}{c}", right.schema[c].dataType) for c in r_payload]
    )
    lt = F.col(left_time)
    l_side = left.select(
        *[F.col(k) for k in keys],
        lt.alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c).alias(c) for c in l_payload],
        F.lit(None).cast(r_struct_type).alias("_rrow"),
    )
    r_side = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_payload],
        F.struct(
            F.col(right_time).alias("_rt"),
            *[F.col(c).alias(f"{right_prefix}{c}") for c in r_payload],
        ).alias("_rrow"),
    )
    u = l_side.unionByName(r_side)

    # right rows sort BEFORE left rows at equal time → "<=" semantics
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        u.select(
            *keys, "_t", "_is_left", *l_payload,
            F.last("_rrow", ignorenulls=True).over(w).alias("_m"),
        )
        .filter(F.col("_is_left") == 1)
    )
    if tolerance_seconds is not None:
        within = F.col("_m").isNotNull() & (
            F.unix_timestamp(F.col("_t")) - F.unix_timestamp(F.col("_m._rt"))
            <= tolerance_seconds
        )
        out = out.select(
            *keys,
            F.col("_t").alias(left_time),
            *l_payload,
            *[
                F.when(within, F.col(f"_m.{right_prefix}{c}")).alias(f"{right_prefix}{c}")
                for c in r_payload
            ],
        )
    else:
        out = out.select(
            *keys, F.col("_t").alias(left_time), *l_payload,
            *[F.col(f"_m.{right_prefix}{c}").alias(f"{right_prefix}{c}") for c in r_payload],
        )
    return out
