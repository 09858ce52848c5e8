"""Column-profile statistics — the StatisticsExtract analogue.

Reference parity: ``extract/StatisticsExtract.scala:112-136`` +
``util/StatisticsUtils.scala:25-256`` build ONE wide aggregate row over
the whole table (count / distinct / HLL approx-distinct / null count /
mean / stddev / min / max / string lengths / percentiles) and pivot it to
one row per column. Same plan here: a single ``df.agg(*exprs)`` pass —
one job, one shuffle-free partial-aggregate tree — then a driver-side
pivot of the 1-row result (O(#columns), not O(rows)).

Scale: a single full scan with partial aggregation; approx_count_distinct
(HLL++) and percentile_approx keep per-column state O(1); exact
percentiles are opt-in (they buffer values) exactly as the reference
gates them behind ``approximate=false``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

_NUM_STATS = ["mean", "stddev", "min", "max", "p25", "p50", "p75"]


def statistics(
    df: DataFrame,
    *,
    approximate: bool = True,
    hll_relative_sd: float = 0.05,
    percentiles: bool = True,
    stddev: bool = True,
) -> DataFrame:
    """Profile every column of ``df``; returns one row per column with
    count/distinct/nulls/mean/stddev/min/max/percentiles/length stats.

    ``percentiles=False`` / ``stddev=False`` skip computing those stats
    (their output columns stay in the schema as NULL). The single eager
    ``df.agg(...).first()`` defeats downstream column pruning, so a
    caller that will project them away MUST opt out here or pay anyway —
    in exact mode each ``F.percentile`` buffers the entire column per
    percentile (3 percentiles x 8 numeric columns held the whole
    lineitem table 24x over: 100 s at sf0.1 for stats the caller
    dropped)."""
    spark = df.sparkSession
    aggs = []
    for f_ in df.schema.fields:
        c, name = F.col(f_.name), f_.name
        aggs.append(F.count(c).alias(f"{name}__count"))
        if approximate:
            aggs.append(
                F.approx_count_distinct(c, hll_relative_sd).alias(f"{name}__distinct")
            )
        # exact distinct counts run as separate per-column jobs below: N
        # count_distinct's in ONE aggregate plan an Expand that duplicates
        # every row N+1 times through the aggregation (measured 12x row
        # blowup on lineitem); a SINGLE-distinct aggregate needs no Expand
        # and its scan prunes to just that column
        aggs.append(F.count_if(c.isNull()).alias(f"{name}__nulls"))
        if isinstance(f_.dataType, NumericType):
            d = c.cast("double")
            # mean via exact decimal sum, not F.avg(double): double
            # summation is partition-order-dependent; the decimal tree is
            # exact so the result is deterministic (and oracle-matchable)
            aggs.append(
                (F.sum(d.cast("decimal(30,6)")).cast("double") / F.count(d)).alias(
                    f"{name}__mean"
                )
            )
            if stddev:
                aggs.append(F.stddev_samp(d).alias(f"{name}__stddev"))
            aggs.append(F.min(d).alias(f"{name}__min"))
            aggs.append(F.max(d).alias(f"{name}__max"))
            if percentiles:
                pfn = F.percentile_approx if approximate else F.percentile
                aggs.append(pfn(d, 0.25).alias(f"{name}__p25"))
                aggs.append(pfn(d, 0.5).alias(f"{name}__p50"))
                aggs.append(pfn(d, 0.75).alias(f"{name}__p75"))
        if isinstance(f_.dataType, StringType):
            # string min/max nulled in the reference to avoid leaking data
            # (util/StatisticsUtils.scala:212-213); we profile lengths only.
            aggs.append(F.min(F.length(c)).cast("double").alias(f"{name}__minlen"))
            aggs.append(F.avg(F.length(c)).alias(f"{name}__avglen"))
            aggs.append(F.max(F.length(c)).cast("double").alias(f"{name}__maxlen"))

    if not approximate:
        # exact mode runs one extra job per column (below): persist so a
        # DERIVED input (a join/transform chain) is computed once, not
        # once per column — for a bare file scan the cache build costs
        # ~one scan and the per-column jobs read it back instead of
        # re-opening the files. Unpersisted before returning.
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK_DESER)
    try:
        row = df.agg(*aggs).first().asDict()
        if not approximate:
            # one thin job per column, a few in flight so the next job's
            # tasks back-fill the tail of the current one (guide §2.6)
            from concurrent.futures import ThreadPoolExecutor

            def _cd(name: str) -> tuple[str, int]:
                return name, df.agg(
                    F.count_distinct(F.col(name)).alias("_d")
                ).first()[0]

            with ThreadPoolExecutor(max_workers=4) as pool:
                for name, v in pool.map(
                    _cd, [f_.name for f_ in df.schema.fields]
                ):
                    row[f"{name}__distinct"] = v
    finally:
        if not approximate:
            df.unpersist()

    out = []
    for f_ in df.schema.fields:
        name = f_.name
        rec = {
            "col_name": name,
            "data_type": f_.dataType.simpleString(),
            "count": row[f"{name}__count"],
            "distinct_count": row[f"{name}__distinct"],
            "null_count": row[f"{name}__nulls"],
        }
        for s in _NUM_STATS:
            rec[s] = row.get(f"{name}__{s}")
        for s in ("minlen", "avglen", "maxlen"):
            rec[s] = float(row[f"{name}__{s}"]) if row.get(f"{name}__{s}") is not None else None
        out.append(rec)

    schema = (
        "col_name string, data_type string, count long, distinct_count long, "
        "null_count long, mean double, stddev double, min double, max double, "
        "p25 double, p50 double, p75 double, minlen double, avglen double, maxlen double"
    )
    return spark.createDataFrame(out, schema=schema)
