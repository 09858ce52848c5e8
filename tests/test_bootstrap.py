"""Initial-snapshot bootstrap + change-tail handoff.

A real CDC deployment starts from a consistent snapshot of the source
table plus the log position it was read at (Debezium snapshot.mode=
initial); the tail replay must resume from exactly that position — no
gap, no double-apply. bootstrap_snapshot commits the snapshot as the
fenced first epoch with end_seq = snapshot_seq, so ReplayRunner's normal
resume rule (continue from snapshot.end_seq + 1) IS the handoff.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from arc_spark.cdc.bootstrap import bootstrap_snapshot, create_table_for_stream
from arc_spark.cdc.generator import write_change_stream
from arc_spark.cdc.reference import reference_replay
from arc_spark.cdc.runner import ReplayRunner

N_EVENTS = 4000
CUTOFF = 1999  # snapshot position: events 0..CUTOFF are IN the snapshot


@pytest.fixture(scope="module")
def stream_path(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bstream")
    return write_change_stream(
        spark, str(d / "events"), N_EVENTS, seed=7, num_partitions=8
    )


@pytest.fixture(scope="module")
def events(spark, stream_path):
    return [r.asDict() for r in spark.read.parquet(stream_path).collect()]


@pytest.fixture(scope="module")
def full_state(events):
    return reference_replay(events)


_SNAP_SCHEMA = StructType(
    [
        StructField("seq", LongType(), False),
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("content", StringType(), True),
    ]
)


def _snapshot_rows(events, *, with_seq=True):
    """The source table at position CUTOFF, via the brute-force oracle."""
    state = reference_replay([e for e in events if e["seq"] <= CUTOFF])
    return [
        (
            (v["seq"] if with_seq else CUTOFF),
            k[0],
            k[1],
            v["commit"],
            v["lang"],
            v["content"],
        )
        for k, v in sorted(state.items())
    ]


def _assert_matches(spark, table, full_state):
    got = {(r["repo"], r["path"]): r for r in table.read(spark).collect()}
    assert set(got) == set(full_state)
    for key, exp in full_state.items():
        assert got[key]["content_sha256"] == exp["sha256"], key


def test_snapshot_tail_handoff_matches_full_replay(
    spark, stream_path, events, full_state, tmp_path
):
    table, _ = create_table_for_stream(spark, stream_path, str(tmp_path / "lake"))
    snap_df = spark.createDataFrame(_snapshot_rows(events), _SNAP_SCHEMA)
    res = bootstrap_snapshot(spark, table, snap_df, CUTOFF)
    assert res["status"] == "committed"
    assert table.snapshot().end_seq == CUTOFF

    # the runner picks up at CUTOFF + 1 with no explicit cursor
    metrics = ReplayRunner(spark, stream_path, table, batch_size=700).run()
    assert metrics[0]["start_seq"] == CUTOFF + 1
    assert sum(m["events_read"] for m in metrics) == N_EVENTS - CUTOFF - 1
    _assert_matches(spark, table, full_state)
    # per-row snapshot positions survive: a key untouched by the tail
    # keeps the seq its snapshot row carried, exactly like a full replay
    got = {(r["repo"], r["path"]): r for r in table.read(spark).collect()}
    for key, exp in full_state.items():
        assert got[key]["seq"] == exp["seq"], key


def test_snapshot_without_seq_column_uses_position(
    spark, stream_path, events, full_state, tmp_path
):
    table, _ = create_table_for_stream(spark, stream_path, str(tmp_path / "lake"))
    rows = [r[1:] for r in _snapshot_rows(events)]  # drop seq
    snap_df = spark.createDataFrame(
        rows, StructType(_SNAP_SCHEMA.fields[1:])
    )
    bootstrap_snapshot(spark, table, snap_df, CUTOFF)
    ReplayRunner(spark, stream_path, table, batch_size=10**9).run()
    # content converges to the full replay even though untouched keys all
    # sit at seq == CUTOFF (whole snapshot at one position)
    got = {(r["repo"], r["path"]): r for r in table.read(spark).collect()}
    assert {k: v["content_sha256"] for k, v in got.items()} == {
        k: v["sha256"] for k, v in full_state.items()
    }
    untouched = [k for k, v in full_state.items() if v["seq"] <= CUTOFF]
    assert untouched and all(got[k]["seq"] == CUTOFF for k in untouched)


def test_bootstrap_idempotent_retry(spark, stream_path, events, tmp_path):
    table, _ = create_table_for_stream(spark, stream_path, str(tmp_path / "lake"))
    snap_df = spark.createDataFrame(_snapshot_rows(events), _SNAP_SCHEMA)
    first = bootstrap_snapshot(spark, table, snap_df, CUTOFF)
    assert first["status"] == "committed"
    v = table.current_version()
    retry = bootstrap_snapshot(spark, table, snap_df, CUTOFF)
    assert retry["status"] == "skipped"
    assert table.current_version() == v


def test_bootstrap_rejected_over_replayed_table(spark, stream_path, events, tmp_path):
    table, _ = create_table_for_stream(spark, stream_path, str(tmp_path / "lake"))
    ReplayRunner(spark, stream_path, table, batch_size=10**9).run()
    snap_df = spark.createDataFrame(_snapshot_rows(events), _SNAP_SCHEMA)
    with pytest.raises(ValueError, match="already has committed epochs"):
        bootstrap_snapshot(spark, table, snap_df, CUTOFF)


def test_bootstrap_rejects_op_column(spark, stream_path, events, tmp_path):
    table, _ = create_table_for_stream(spark, stream_path, str(tmp_path / "lake"))
    snap_df = spark.createDataFrame(
        _snapshot_rows(events), _SNAP_SCHEMA
    ).withColumn("op", F.lit("insert"))
    with pytest.raises(ValueError, match="'op' column"):
        bootstrap_snapshot(spark, table, snap_df, CUTOFF)


def test_snapshot_row_beyond_position_fails(spark, stream_path, events, tmp_path):
    """A row claiming a seq AFTER the declared snapshot position would
    silently shadow tail events — the codegen guard fails the load."""
    table, _ = create_table_for_stream(spark, stream_path, str(tmp_path / "lake"))
    rows = _snapshot_rows(events)
    rows[0] = (CUTOFF + 50, *rows[0][1:])
    snap_df = spark.createDataFrame(rows, _SNAP_SCHEMA)
    with pytest.raises(Exception, match="beyond snapshot_seq"):
        bootstrap_snapshot(spark, table, snap_df, CUTOFF)
    # nothing committed: the table is still bootstrappable
    assert not table.snapshot().committed_epochs


def test_stage_snapshot_bootstrap(spark, stream_path, events, full_state, tmp_path):
    """Declarative path: CDCReplayExecute with snapshotURI/snapshotSeq."""
    from arc_spark.pipeline.config import run_config

    snap_df = spark.createDataFrame(_snapshot_rows(events), _SNAP_SCHEMA)
    snap_uri = str(tmp_path / "snapshot")
    snap_df.write.mode("overwrite").parquet(snap_uri)
    conf = {
        "stages": [
            {
                "type": "CDCReplayExecute",
                "name": "replay with initial load",
                "environments": ["test"],
                "eventsURI": stream_path,
                "tableURI": str(tmp_path / "lake"),
                "snapshotURI": snap_uri,
                "snapshotSeq": CUTOFF,
                "batchSize": 700,
                "outputView": "final_state",
            }
        ]
    }
    _, ctx = run_config(spark, conf, environment="test")
    got = {
        (r["repo"], r["path"]): r
        for r in ctx.spark.table("final_state").collect()
    }
    assert {k: v["content_sha256"] for k, v in got.items()} == {
        k: v["sha256"] for k, v in full_state.items()
    }
    # replay metrics show the tail started after the snapshot position
    starts = [e["start_seq"] for e in ctx.events if "start_seq" in e]
    assert starts and min(starts) == CUTOFF + 1


def test_bootstrap_retry_with_different_seq_rejected(
    spark, stream_path, events, tmp_path
):
    """The fence must not silently no-op a rerun that CORRECTS the
    snapshot position (the committed cursor would stay at the old seq
    while the caller believes the new one took)."""
    table, _ = create_table_for_stream(spark, stream_path, str(tmp_path / "lake"))
    snap_df = spark.createDataFrame(_snapshot_rows(events), _SNAP_SCHEMA)
    bootstrap_snapshot(spark, table, snap_df, CUTOFF)
    with pytest.raises(ValueError, match="already committed at"):
        bootstrap_snapshot(spark, table, snap_df, CUTOFF + 7)
