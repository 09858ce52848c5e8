"""Bucket-count (partition-spec) evolution: LakeTable.grow_buckets.

Growth is a metadata-only commit exploiting hash-mod refinement
(h mod B == b pins h mod B·k to {b, b+B, …}): old file entries are
recorded at their write-time spec, reads translate through
Snapshot.base_cover, COW merges / compaction split parents lazily on
touch, and compact(buckets="auto") finishes the migration. The Iceberg
partition-spec-evolution analogue for the bucket transform (the
reference has no table format at all — engine-specific scale surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from arc_spark.lake.table import LakeTable

SCHEMA = "repo string, path string, seq long, content string, op string"


def _rows(n, start_seq=1):
    return [
        (f"r{i}", f"p{i % 5}", start_seq + i, f"v{start_seq + i}", "update")
        for i in range(n)
    ]


def _mk(spark, root, n=60, num_buckets=4):
    df = spark.createDataFrame(_rows(n), SCHEMA)
    t = LakeTable(root)
    t.create(df.drop("op").schema, ["repo", "path"], num_buckets=num_buckets)
    t.merge(spark, df, epoch=0, start_seq=1, end_seq=n, mode="cow")
    return t


def _state(spark, t):
    return {
        (r["repo"], r["path"]): r["content"] for r in t.read(spark).collect()
    }


def test_grow_is_metadata_only(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    before_files = dict(t.snapshot().files)
    before_state = _state(spark, t)
    res = t.grow_buckets(4)
    assert res["status"] == "grown" and res["num_buckets"] == 16
    snap = t.snapshot()
    assert snap.files == before_files  # nothing moved
    assert snap.num_buckets == 16
    assert set(snap.bucket_specs) == set(before_files)
    assert all(s == 4 for s in snap.bucket_specs.values())
    assert _state(spark, t) == before_state


def test_grow_rejects_bad_factor(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=10)
    for bad in (1, 0, -2, 1.5):
        with pytest.raises(ValueError, match="factor"):
            t.grow_buckets(bad)


def test_cover_translation_math(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.grow_buckets(2)
    snap = t.snapshot()
    cover = snap.base_cover()
    # parent b at spec 4 serves exactly new buckets {b, b+4}
    for b in snap.files:
        assert {c for c, p in cover.items() if p == b} == {b, str(int(b) + 4)}
    covered, storage = snap.storage_closure({"1"})
    assert storage == {"1"} and covered == {"1", "5"}


def test_lookup_prunes_through_parent(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.grow_buckets(8)
    got = t.lookup(spark, [("r7", "p2")]).collect()
    assert len(got) == 1 and got[0]["content"] == "v8"


def test_cow_merge_splits_touched_parent_only(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.grow_buckets(2)
    before_state = _state(spark, t)
    upd = spark.createDataFrame(
        [("r0", "p0", 1000, "winner", "update")], SCHEMA
    )
    t.merge(spark, upd, epoch=1, start_seq=1000, end_seq=1000, mode="cow")
    snap = t.snapshot()
    # the touched key's parent left the spec map; the others remain
    assert len(snap.bucket_specs) == 3
    # its two children are now full-spec entries; no double ownership
    assert len(snap.files) == 3 + 2
    got = _state(spark, t)
    assert got[("r0", "p0")] == "winner"
    assert {k: v for k, v in got.items() if k != ("r0", "p0")} == {
        k: v for k, v in before_state.items() if k != ("r0", "p0")
    }


def test_delta_merge_on_unsplit_parent_resolves(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.grow_buckets(2)
    upd = spark.createDataFrame([("r1", "p1", 1000, "dwin", "update")], SCHEMA)
    t.merge(spark, upd, epoch=1, start_seq=1000, end_seq=1000, mode="delta")
    snap = t.snapshot()
    assert sum(len(v) for v in snap.delta_files.values()) == 1
    assert len(snap.bucket_specs) == 4  # delta never splits the base
    got = _state(spark, t)
    assert got[("r1", "p1")] == "dwin" and len(got) == 60
    # a later COW touch of the same key folds the delta AND splits
    upd2 = spark.createDataFrame([("r1", "p1", 2000, "cwin", "update")], SCHEMA)
    t.merge(spark, upd2, epoch=2, start_seq=2000, end_seq=2000, mode="cow")
    snap = t.snapshot()
    assert snap.delta_files == {}
    got = _state(spark, t)
    assert got[("r1", "p1")] == "cwin" and len(got) == 60


def test_delete_through_growth_boundary(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.grow_buckets(2)
    d = spark.createDataFrame([("r2", "p2", 1000, None, "delete")], SCHEMA)
    t.merge(spark, d, epoch=1, start_seq=1000, end_seq=1000, mode="cow")
    got = _state(spark, t)
    assert ("r2", "p2") not in got and len(got) == 59
    # late-arriving older event cannot resurrect across the boundary
    late = spark.createDataFrame([("r2", "p2", 3, "stale", "update")], SCHEMA)
    t.merge(spark, late, epoch=2, start_seq=3, end_seq=3, mode="cow")
    assert ("r2", "p2") not in _state(spark, t)


def test_auto_compact_finishes_migration(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.grow_buckets(2)
    before = _state(spark, t)
    assert set(t.buckets_needing_compaction(t.snapshot())) == set(
        t.snapshot().files
    )
    t.compact(spark, buckets="auto")
    snap = t.snapshot()
    assert snap.bucket_specs == {}
    assert len(snap.files) == 8  # every parent split to the new spec
    assert _state(spark, t) == before
    # steady state again: nothing to compact
    assert t.buckets_needing_compaction(snap) == []


def test_grow_requires_deltas_folded(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    upd = spark.createDataFrame([("r1", "p1", 1000, "d", "update")], SCHEMA)
    t.merge(spark, upd, epoch=1, start_seq=1000, end_seq=1000, mode="delta")
    with pytest.raises(ValueError, match="delta"):
        t.grow_buckets(2)
    # with spark it folds them itself, then grows
    res = t.grow_buckets(2, spark=spark)
    assert res["status"] == "grown"
    snap = t.snapshot()
    assert snap.delta_files == {}
    assert _state(spark, t)[("r1", "p1")] == "d"


def test_repeated_growth_multi_spec(spark, tmp_path):
    """Two growths without full migration: specs 4 and 16 coexist."""
    t = _mk(spark, str(tmp_path / "t"))
    t.grow_buckets(2)  # 8
    # touch one parent so part of the table is at spec 8
    upd = spark.createDataFrame([("r0", "p0", 1000, "w1", "update")], SCHEMA)
    t.merge(spark, upd, epoch=1, start_seq=1000, end_seq=1000, mode="cow")
    t.grow_buckets(2)  # 16
    snap = t.snapshot()
    assert snap.num_buckets == 16
    assert set(snap.bucket_specs.values()) == {4, 8}
    got = _state(spark, t)
    assert got[("r0", "p0")] == "w1" and len(got) == 60
    # a full-table merge (no pruning) rewrites everything at spec 16
    upd2 = spark.createDataFrame([("r3", "p3", 2000, "w2", "update")], SCHEMA)
    t.merge(
        spark, upd2, epoch=2, start_seq=2000, end_seq=2000,
        mode="cow", bucket_pruning=False,
    )
    snap = t.snapshot()
    assert snap.bucket_specs == {}
    got = _state(spark, t)
    assert got[("r3", "p3")] == "w2" and len(got) == 60


def test_changes_since_across_growth(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    cut = t.snapshot().end_seq
    t.grow_buckets(2)
    upd = spark.createDataFrame(
        [("r0", "p0", 1000, "new", "update"), ("r9", "p4", 1001, None, "delete")],
        SCHEMA,
    )
    t.merge(spark, upd, epoch=1, start_seq=1000, end_seq=1001, mode="cow")
    ch = {(r["repo"], r["path"]): r["op"] for r in t.changes_since(spark, cut).collect()}
    assert ch == {("r0", "p0"): "upsert", ("r9", "p4"): "delete"}


def test_replay_with_growth_equals_ungrown_replay(spark, tmp_path):
    """Grow mid-replay; final state must equal a replay that never grew."""
    from arc_spark.cdc.bootstrap import create_table_for_stream
    from arc_spark.cdc.generator import write_change_stream
    from arc_spark.cdc.runner import ReplayRunner

    stream = write_change_stream(
        spark, str(tmp_path / "ev"), 2000, seed=13, num_partitions=8
    )
    ref, _ = create_table_for_stream(spark, stream, str(tmp_path / "ref"), num_buckets=8)
    ReplayRunner(spark, stream, ref, batch_size=500).run()

    t, _ = create_table_for_stream(spark, stream, str(tmp_path / "grown"), num_buckets=8)
    ReplayRunner(spark, stream, t, batch_size=500).run(max_epochs=2)
    t.grow_buckets(4, spark=spark)
    ReplayRunner(spark, stream, t, batch_size=500).run()

    a = t.read(spark)
    b = ref.read(spark)
    a = a.select(*sorted(a.columns))
    b = b.select(*sorted(b.columns))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert t.snapshot().num_buckets == 32


def test_rollback_across_growth(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v = t.current_version()
    before = _state(spark, t)
    t.grow_buckets(2)
    upd = spark.createDataFrame([("r0", "p0", 1000, "x", "update")], SCHEMA)
    t.merge(spark, upd, epoch=1, start_seq=1000, end_seq=1000, mode="cow")
    t.rollback(v)
    snap = t.snapshot()
    assert snap.num_buckets == 4 and snap.bucket_specs == {}
    assert _state(spark, t) == before


def test_lake_grow_execute_stage(spark, tmp_path):
    from arc_spark.pipeline import run_config

    root = str(tmp_path / "stage")
    t = _mk(spark, root, n=20)
    _, ctx = run_config(spark, {"stages": [
        {"type": "LakeGrowExecute", "name": "grow", "tableURI": root, "factor": 4},
        {"type": "LakeCompactExecute", "name": "finish", "tableURI": root,
         "buckets": "auto"},
    ]})
    assert ctx.user_data["grow.result"]["num_buckets"] == 16
    snap = t.snapshot()
    assert snap.num_buckets == 16 and snap.bucket_specs == {}
    assert len(_state(spark, t)) == 20


def test_grow_never_drops_concurrently_committed_deltas(spark, tmp_path):
    """A delta merge landing between grow's internal delta-fold and its
    own commit must NOT be orphaned by a 'delta_files: {}' manifest: the
    loop re-checks from a fresh snapshot every attempt and, if writers
    keep winning, fails with CommitConflict — leaving every committed
    delta referenced."""
    from arc_spark.lake.table import CommitConflict

    t = _mk(spark, str(tmp_path / "t"))
    upd = spark.createDataFrame([("r1", "p1", 1000, "d0", "update")], SCHEMA)
    t.merge(spark, upd, epoch=1, start_seq=1000, end_seq=1000, mode="delta")

    real_compact = t.compact
    seq = [1000]

    def compact_then_concurrent_delta(*a, **k):
        res = real_compact(*a, **k)
        # a concurrent writer sneaks a new delta in right after the fold
        seq[0] += 1
        d = spark.createDataFrame(
            [("r2", "p2", seq[0], f"d{seq[0]}", "update")], SCHEMA
        )
        t.merge(
            spark, d, epoch=seq[0], start_seq=seq[0], end_seq=seq[0], mode="delta"
        )
        return res

    t.compact = compact_then_concurrent_delta
    with pytest.raises(CommitConflict, match="delta-free"):
        t.grow_buckets(2, spark=spark, max_retries=2)
    t.compact = real_compact
    snap = t.snapshot()
    # nothing grew, nothing lost: the last concurrent delta is still live
    assert snap.num_buckets == 4
    assert sum(len(v) for v in snap.delta_files.values()) == 1
    got = _state(spark, t)
    assert got[("r2", "p2")] == f"d{seq[0]}" and got[("r1", "p1")] == "d0"
    # and with the interference gone, growth succeeds and keeps the state
    t.grow_buckets(2, spark=spark)
    assert _state(spark, t) == got


def test_grow_with_one_delta_succeeds_at_max_retries_1(spark, tmp_path):
    """A SUCCESSFUL delta fold must not consume a commit attempt: with
    max_retries=1 and one outstanding delta, growth folds then commits
    instead of raising a spurious 'concurrent writers' conflict."""
    t = _mk(spark, str(tmp_path / "t"))
    upd = spark.createDataFrame([("r1", "p1", 1000, "d", "update")], SCHEMA)
    t.merge(spark, upd, epoch=1, start_seq=1000, end_seq=1000, mode="delta")
    res = t.grow_buckets(2, spark=spark, max_retries=1)
    assert res["status"] == "grown"
    assert _state(spark, t)[("r1", "p1")] == "d"


def test_lake_compact_execute_scalar_bucket(spark, tmp_path):
    """A scalar bucket id in the stage config ("12" or 12) must reach
    compact() as ONE bucket — a bare string would be iterated
    character-wise (compacting buckets 1 and 2 instead of 12)."""
    from arc_spark.pipeline import run_config

    root = str(tmp_path / "scalar")
    t = _mk(spark, root, n=60, num_buckets=16)
    # fragment bucket 12 with a delta so a rewrite is observable
    row = t.read(spark).withColumn(
        "_b", F.pmod(F.xxhash64("repo", "path"), F.lit(16))
    ).where("_b = 12").limit(1).collect()
    if row:  # 60 keys over 16 buckets: bucket 12 is occupied for this seed
        upd = spark.createDataFrame(
            [(row[0]["repo"], row[0]["path"], 1000, "zz", "update")], SCHEMA
        )
        t.merge(spark, upd, epoch=1, start_seq=1000, end_seq=1000, mode="delta")
    _, ctx = run_config(spark, {"stages": [
        {"type": "LakeCompactExecute", "name": "one", "tableURI": root,
         "buckets": "12"},
    ]})
    res = ctx.user_data["one.result"]
    assert res["status"] in ("compacted", "noop")
    if res["status"] == "compacted":
        assert res["buckets_rewritten"] == 1
    assert t.snapshot().delta_files.get("12", []) == []
