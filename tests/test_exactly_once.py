"""Exactly-once, resume, fencing, and schema evolution.

North-rule requirements: idempotent commit manifests + epoch-fenced
snapshot commits; resumable from the checkpointed offset log (which lives
inside the snapshot); additive schema evolution. Failure injection mirrors
the reference's ChaosMonkey lifecycle plugin
(``plugins/lifecycle/ChaosMonkey.scala:81-96``).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arc_spark.cdc.bootstrap import create_table_for_stream
from arc_spark.cdc.generator import write_change_stream
from arc_spark.cdc.reference import reference_replay
from arc_spark.cdc.runner import InjectedFailure, ReplayRunner

N = 3000


@pytest.fixture(scope="module")
def stream_path(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("xonce")
    return write_change_stream(spark, str(d / "events"), N, seed=99, num_partitions=8)


@pytest.fixture(scope="module")
def expected(spark, stream_path):
    events = [r.asDict() for r in spark.read.parquet(stream_path).collect()]
    return {k: v["sha256"] for k, v in reference_replay(events).items()}


def _state(spark, table):
    return {
        (r["repo"], r["path"]): r["content_sha256"] for r in table.read(spark).collect()
    }


def test_crash_before_commit_then_resume(spark, stream_path, expected, tmp_path):
    table, _ = create_table_for_stream(spark, stream_path, str(tmp_path / "lake"))

    calls = {"n": 0}

    def injector(epoch, phase):
        # crash the first attempt of epoch 1 before its merge commits
        if phase == "before_merge" and epoch == 1 and calls["n"] == 0:
            calls["n"] += 1
            raise InjectedFailure("chaos")

    runner = ReplayRunner(spark, stream_path, table, batch_size=1000)
    with pytest.raises(InjectedFailure):
        runner.run(failure_injector=injector)
    # epoch 0 committed, epoch 1 not
    snap = table.snapshot()
    assert snap.end_seq == 999
    # resume with a fresh runner (fresh process semantics)
    ReplayRunner(spark, stream_path, table, batch_size=1000).run()
    assert _state(spark, table) == expected


def test_crash_after_commit_then_resume_no_duplicates(spark, stream_path, expected, tmp_path):
    table, _ = create_table_for_stream(spark, stream_path, str(tmp_path / "lake"))

    fired = {"done": False}

    def injector(epoch, phase):
        if phase == "after_merge" and epoch == 1 and not fired["done"]:
            fired["done"] = True
            raise InjectedFailure("chaos")

    runner = ReplayRunner(spark, stream_path, table, batch_size=1000)
    with pytest.raises(InjectedFailure):
        runner.run(failure_injector=injector)
    # epoch 1 DID commit before the crash
    assert table.snapshot().end_seq == 1999
    ReplayRunner(spark, stream_path, table, batch_size=1000).run()
    snap = table.snapshot()
    assert sorted(int(e) for e in snap.committed_epochs) == [0, 1, 2]
    assert _state(spark, table) == expected


def test_duplicate_epoch_merge_is_fenced(spark, stream_path, tmp_path):
    from arc_spark.cdc.apply import last_writer_wins, normalize_and_fingerprint

    table, _ = create_table_for_stream(spark, stream_path, str(tmp_path / "lake"))
    ReplayRunner(spark, stream_path, table, batch_size=1000).run(max_epochs=1)
    v = table.current_version()
    batch = (
        spark.read.parquet(stream_path)
        .filter(F.col("seq") <= 999)
        .filter(F.col("op") != "schema-change")
    )
    deduped = last_writer_wins(normalize_and_fingerprint(batch), ["repo", "path"], "seq")
    res = table.merge(spark, deduped, epoch=0, start_seq=0, end_seq=999)
    assert res["status"] == "skipped"
    assert table.current_version() == v


def test_schema_evolution_adds_column(spark, tmp_path):
    """lang column absent before the schema-change event, present after."""
    d = str(tmp_path / "evostream")
    write_change_stream(spark, d, 1200, seed=5, num_partitions=4, schema_change_at=600)
    # table bootstrapped WITHOUT lang (pre-evolution schema)
    table, _ = create_table_for_stream(
        spark, d, str(tmp_path / "lake"), drop_cols=("op", "lang")
    )
    assert "lang" not in [f.name for f in table.snapshot().schema.fields]

    runner = ReplayRunner(spark, d, table, batch_size=600)
    runner.run()

    snap = table.snapshot()
    names = [f.name for f in snap.schema.fields]
    assert "lang" in names  # widened by the post-cutover batch

    rows = table.read(spark).collect()
    events = [r.asDict() for r in spark.read.parquet(d).collect()]
    exp = reference_replay(events)
    got = {(r["repo"], r["path"]): r for r in rows}
    assert {k: r["content_sha256"] for k, r in got.items()} == {
        k: v["sha256"] for k, v in exp.items()
    }
    # rows whose winner is post-cutover carry lang; pre-cutover winners null
    for k, r in got.items():
        if exp[k]["seq"] > 600:
            assert r["lang"] is not None, k
        else:
            assert r["lang"] is None, k


def test_concurrent_merge_conflict_retries_and_preserves_both(spark, tmp_path, monkeypatch):
    """Optimistic concurrency: a competing commit lands between a merge's
    snapshot read and its manifest CAS. The losing writer must retry from
    the NEW snapshot and both epochs' rows must survive."""
    import json

    from arc_spark.lake.table import LakeTable

    t = LakeTable(str(tmp_path / "races"))
    df0 = spark.createDataFrame(
        [(1, "a", 0, "upsert"), (2, "b", 1, "upsert")],
        "k: long, v: string, seq: long, op: string",
    )
    t.create(df0.drop("op").schema, ["k"], num_buckets=4)
    t.merge(spark, df0, epoch=0, start_seq=0, end_seq=1)

    competitor = spark.createDataFrame(
        [(3, "c", 2, "upsert")], "k: long, v: string, seq: long, op: string"
    )
    orig_commit = LakeTable._commit
    state = {"raced": False}

    def racing_commit(self, manifest):
        if not state["raced"]:
            state["raced"] = True
            # competing writer (epoch 1) wins the version first
            t2 = LakeTable(t.root)
            t2.merge(spark, competitor, epoch=1, start_seq=2, end_seq=2)
            # the in-flight manifest now targets a taken version -> CAS loss
        return orig_commit(self, manifest)

    monkeypatch.setattr(LakeTable, "_commit", racing_commit)
    ours = spark.createDataFrame(
        [(4, "d", 3, "upsert")], "k: long, v: string, seq: long, op: string"
    )
    r = t.merge(spark, ours, epoch=2, start_seq=3, end_seq=3)
    monkeypatch.setattr(LakeTable, "_commit", orig_commit)
    assert r["status"] == "committed"
    snap = t.snapshot()
    assert set(snap.committed_epochs) == {"0", "1", "2"}
    rows = {row["k"]: row["v"] for row in t.read(spark).collect()}
    assert rows == {1: "a", 2: "b", 3: "c", 4: "d"}


def test_quarantine_is_idempotent_across_retry(spark, tmp_path):
    """A crash AFTER the quarantine write but BEFORE the merge commit must
    not duplicate quarantined rows on retry: the per-epoch quarantine dir
    is overwritten, and the epoch itself is fenced."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from arc_spark.cdc.bootstrap import create_table_for_stream
    from arc_spark.cdc.generator import write_change_stream
    from arc_spark.cdc.runner import InjectedFailure, ReplayRunner

    clean = write_change_stream(
        spark, str(tmp_path / "qr_ev0"), 600, seed=17, num_partitions=4
    )
    base = spark.read.parquet(clean)
    donor = base.filter(F.col("op") == "update").limit(1)
    bad = donor.withColumn("seq", F.lit(600).cast("long")).withColumn(
        "op", F.lit("junk")
    )
    mixed = str(tmp_path / "qr_ev")
    base.union(bad).repartition(4).write.parquet(mixed)

    qdir = str(tmp_path / "qr_quarantine")
    table, _ = create_table_for_stream(spark, mixed, str(tmp_path / "qr_lake"))

    def crash_before_merge(epoch, phase):
        if phase == "before_merge":
            raise InjectedFailure(f"crash at epoch {epoch}")

    runner = ReplayRunner(
        spark, mixed, table, batch_size=10**9,
        on_bad="quarantine", quarantine_path=qdir,
    )
    with _pytest.raises(InjectedFailure):
        runner.run(failure_injector=crash_before_merge)
    # quarantine written, nothing committed
    assert spark.read.parquet(f"{qdir}/epoch=0").count() == 1
    assert table.snapshot().end_seq == -1

    # retry without injection: same epoch id, quarantine dir overwritten
    ReplayRunner(
        spark, mixed, table, batch_size=10**9,
        on_bad="quarantine", quarantine_path=qdir,
    ).run()
    assert spark.read.parquet(f"{qdir}/epoch=0").count() == 1  # no dup
    assert table.snapshot().end_seq == 600
