"""Snapshot diff — the DiffTransform analogue.

Reference parity: ``transform/DiffTransform.scala:116-171`` hashes each
row as sha2-512 of to_json(struct(*)) and full-outer-joins the two views
on the hash, emitting left-only / intersection / right-only views. Same
algorithm here; the hash join means arbitrarily-typed rows compare with a
single equi-join (one shuffle on a 128-char key, AQE-broadcastable when
one side is small).

Note: at 100 TB you would diff on a declared key set rather than whole-row
hashes where possible (smaller shuffle key, and allows pre-partitioned /
bucketed joins); ``key_cols`` enables that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_hash(df: DataFrame, cols: list[str]):
    return F.sha2(F.to_json(F.struct(*[F.col(c) for c in cols])), 512)


def diff_views(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Return {"left_only", "intersection", "right_only"} DataFrames.

    ``key_cols``: hash only these columns (defaults to all columns, i.e.
    whole-row equality, matching the reference).
    """
    cols = key_cols or left.columns
    if set(cols) - set(right.columns):
        raise ValueError("right view missing diff columns")
    lh = left.withColumn("_hash", _row_hash(left, cols))
    rh = right.withColumn("_hash", _row_hash(right, cols))

    left_only = lh.join(rh.select("_hash"), "_hash", "left_anti").drop("_hash")
    right_only = rh.join(lh.select("_hash"), "_hash", "left_anti").drop("_hash")
    intersection = lh.join(rh.select("_hash"), "_hash", "left_semi").drop("_hash")
    return {
        "left_only": left_only,
        "intersection": intersection,
        "right_only": right_only,
    }
