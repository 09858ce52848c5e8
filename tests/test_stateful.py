"""applyInPandasWithState sessionization: gap splitting within and across
micro-batches, state carry-over, open-session snapshots."""

from __future__ import annotations

import datetime

import pytest

from arc_spark.streaming.stateful import sessionize

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_sessionize_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "events")
    sec = datetime.timedelta(seconds=1)
    # batch 1: user 1 has two sessions (gap > 60s); user 2 one session
    _write_batch(
        spark, src,
        [
            (1, T0), (1, T0 + 10 * sec), (1, T0 + 200 * sec),
            (2, T0 + 5 * sec),
        ],
    )
    # batch 2: user 1 continues the session at 200s; user 2 new session
    _write_batch(
        spark, src,
        [
            (1, T0 + 230 * sec),
            (2, T0 + 500 * sec),
        ],
    )

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sessions = sessionize(stream, key_col="user_id", ts_col="ts", gap_seconds=60)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("sessions_out").collect()

    # final state per (key, session_start): last emitted row
    final: dict = {}
    for r in rows:
        final[(r["key"], r["session_start"])] = r

    u1_first = final[(1, T0)]
    assert u1_first["n_events"] == 2 and u1_first["closed"] is True
    u1_second = final[(1, T0 + 200 * sec)]
    assert u1_second["n_events"] == 2  # 200s + 230s merged across batches
    u2_first = final[(2, T0 + 5 * sec)]
    assert u2_first["n_events"] == 1 and u2_first["closed"] is True
    u2_second = final[(2, T0 + 500 * sec)]
    assert u2_second["n_events"] == 1
