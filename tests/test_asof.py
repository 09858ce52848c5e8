"""As-of join vs pandas merge_asof (the de-facto semantics oracle)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from arc_spark.operators.asof import asof_join


@pytest.fixture()
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [
            ("A", 10.0, 1), ("A", 20.0, 2), ("A", 25.0, 3),
            ("B", 5.0, 4), ("B", 30.0, 5), ("C", 1.0, 6),
        ],
        "sym string, t double, trade_id int",
    )
    quotes = spark.createDataFrame(
        [
            ("A", 9.0, 100.0), ("A", 20.0, 101.0), ("A", 24.0, 102.0),
            ("B", 6.0, 200.0), ("C", 99.0, 300.0),
        ],
        "sym string, t double, px double",
    )
    return trades, quotes


def test_asof_backward_semantics(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(
        trades, quotes, keys=["sym"], left_time="t", right_time="t"
    ).orderBy("trade_id")
    rows = out.collect()
    by_id = {r["trade_id"]: r["r_px"] for r in rows}
    # A@10 -> quote@9; A@20 -> quote@20 (<= tie matches); A@25 -> quote@24
    assert by_id[1] == 100.0 and by_id[2] == 101.0 and by_id[3] == 102.0
    # B@5 -> no quote yet (quote at 6 is later)
    assert by_id[4] is None and by_id[5] == 200.0
    # C@1 -> quote at 99 is in the future
    assert by_id[6] is None


def test_asof_matches_pandas_merge_asof(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 300),
            "t": rng.uniform(0, 100, 300).round(3),
            "lid": range(300),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 120),
            "t": rng.uniform(0, 100, 120).round(3),
            "val": rng.uniform(0, 1, 120).round(6),
        }
    )
    # pandas needs sorted inputs
    expected = pd.merge_asof(
        left.sort_values("t"), right.sort_values("t"), on="t", by="k", direction="backward"
    ).sort_values("lid")

    out = (
        asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            keys=["k"], left_time="t", right_time="t",
        )
        .orderBy("lid")
        .toPandas()
    )
    got = out["r_val"].fillna(-999.0).tolist()
    exp = expected["val"].fillna(-999.0).tolist()
    assert got == exp


def test_asof_tolerance(spark, quotes_trades):
    trades, quotes = quotes_trades
    # t columns are doubles; tolerance path uses unix_timestamp → use
    # timestamp columns instead
    t = trades.withColumn("ts", F.timestamp_seconds("t")).drop("t")
    q = quotes.withColumn("ts", F.timestamp_seconds("t")).drop("t")
    out = asof_join(
        t, q, keys=["sym"], left_time="ts", right_time="ts", tolerance_seconds=2
    )
    by_id = {r["trade_id"]: r["r_px"] for r in out.collect()}
    assert by_id[1] == 100.0   # gap 1s <= 2s
    assert by_id[3] == 102.0   # gap 1s
    assert by_id[5] is None    # B@30 vs quote@6: gap 24s > 2s → nulled


def test_asof_null_right_payload_not_stitched(spark):
    """A matched right row with a NULL payload column must yield NULL —
    not an older row's non-null value (per-column carry-forward bug)."""
    left = spark.createDataFrame([("k", 10, "L")], "k string, t long, lv string")
    right = spark.createDataFrame(
        [("k", 1, "old"), ("k", 5, None)], "k string, t long, rv string"
    )
    out = asof_join(left, right, keys=["k"], left_time="t", right_time="t").first()
    assert out["r_rv"] is None  # matched row (t=5) has NULL rv
    assert out["r_t"] == 5
