"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful operator of its own (SURVEY.md §2.7 — it
delegates tumbling/sliding windows to SQL and late data to watermarks);
this module adds the piece a CDC/analytics engine needs beyond built-ins:
gap-based **sessionization** with explicit keyed state.

Scale notes: state lives in Spark's state store keyed by the group column
(one shuffle per micro-batch); per group we keep O(1) state (the single
open session), and in-batch session splitting happens vectorized in
pandas before state is consulted — so a hot key costs a sort of its own
batch rows, never an unbounded state growth. Watermark + EventTimeTimeout
bound state lifetime.
"""

from __future__ import annotations

import datetime

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("closed", BooleanType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Gap-based sessions over an event-time stream.

    Emits one row per session per micro-batch: ``closed=True`` when the
    gap rule or event-time timeout sealed it, ``closed=False`` for the
    still-open session snapshot (downstream keeps the last row per
    (key, session_start) to get final sessions).
    """
    gap = datetime.timedelta(seconds=gap_seconds)

    def fn(key: tuple, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        ts = rows[ts_col].sort_values(ignore_index=True)
        # carried open session, if any
        if state.exists:
            s_start, s_end, s_n = state.get
        else:
            s_start = s_end = None
            s_n = 0

        out = []
        if len(ts) == 0:
            # no data: state timed out → close the open session
            if state.hasTimedOut and s_start is not None:
                out.append((key[0], s_start, s_end, s_n, True))
                state.remove()
        else:
            for t in ts:
                t = t.to_pydatetime()
                if s_start is None:
                    s_start, s_end, s_n = t, t, 1
                elif t - s_end <= gap:
                    s_end, s_n = max(s_end, t), s_n + 1
                else:
                    out.append((key[0], s_start, s_end, s_n, True))
                    s_start, s_end, s_n = t, t, 1
            # snapshot of the still-open session
            out.append((key[0], s_start, s_end, s_n, False))
            state.update((s_start, s_end, s_n))
            # seal when event time passes end-of-session + gap. The naive
            # datetime is session-UTC event time; .timestamp() would
            # interpret it in the MACHINE's local timezone, firing the
            # event-time timeout offset by the UTC delta on non-UTC hosts
            # (possibly below the watermark) — pin it to UTC explicitly.
            import datetime as _dt

            seal = (s_end + gap).replace(tzinfo=_dt.timezone.utc)
            state.setTimeoutTimestamp(int(seal.timestamp() * 1000))
        if out:
            yield pd.DataFrame(
                out,
                columns=["key", "session_start", "session_end", "n_events", "closed"],
            )

    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
