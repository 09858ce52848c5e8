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
    l_payload = [c for c in left.columns if c not in keys and c != left_time]
    r_payload = [c for c in right.columns if c not in keys]

    lt = F.col(left_time)
    l_side = left.select(
        *[F.col(k) for k in keys],
        lt.alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c).alias(c) for c in l_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{right_prefix}{c}") for c in r_payload],
    )
    r_side = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_payload],
        *[F.col(c).alias(f"{right_prefix}{c}") for c in r_payload],
    )
    u = l_side.unionByName(r_side)

    # right rows sort BEFORE left rows at equal time → "<=" semantics
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(F.col(f"{right_prefix}{c}"), ignorenulls=True).over(w).alias(f"{right_prefix}{c}")
        for c in r_payload
    ]
    carried_t = F.last(
        F.when(F.col("_is_left") == 0, F.col("_t")), ignorenulls=True
    ).over(w)

    out = (
        u.select(*keys, "_t", "_is_left", *l_payload, *carried, carried_t.alias("_rt"))
        .filter(F.col("_is_left") == 1)
    )
    if tolerance_seconds is not None:
        within = (
            F.col("_rt").isNotNull()
            & (F.unix_timestamp(F.col("_t")) - F.unix_timestamp(F.col("_rt")) <= tolerance_seconds)
        )
        out = out.select(
            *keys,
            F.col("_t").alias(left_time),
            *l_payload,
            *[
                F.when(within, F.col(f"{right_prefix}{c}")).alias(f"{right_prefix}{c}")
                for c in r_payload
            ],
        )
    else:
        out = out.select(
            *keys, F.col("_t").alias(left_time), *l_payload,
            *[F.col(f"{right_prefix}{c}") for c in r_payload],
        )
    return out
