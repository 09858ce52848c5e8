"""PII scrub + quality filter operators (training-data hygiene)."""

from __future__ import annotations

from pyspark.sql import functions as F

from arc_spark.operators.text import quality_filter, scrub_text


def test_scrub_text_redacts_typed_tokens(spark):
    rows = [
        ("contact bob@example.com or visit https://ex.org/a?b=1 now",),
        ("server at 10.1.2.3 answered",),
        ("call +1 555-123-4567 today",),
        ("nothing to redact here",),
    ]
    df = spark.createDataFrame(rows, "text string")
    got = [r[0] for r in df.select(scrub_text(F.col("text"))).collect()]
    assert got[0] == "contact <EMAIL> or visit <URL> now"
    assert got[1] == "server at <IP> answered"
    assert got[2] == "call <PHONE> today"
    assert got[3] == "nothing to redact here"
    # selective kinds
    only_email = df.select(scrub_text(F.col("text"), kinds=["email"])).collect()
    assert only_email[1][0] == "server at 10.1.2.3 answered"


def test_quality_filter_gates(spark):
    rows = [
        ("short text",),  # < 10 tokens
        ("!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))",),  # punct noise
        ("one two three four five six seven eight nine ten eleven",),  # ok
    ]
    df = spark.createDataFrame(rows, "text string")
    kept = [r[0] for r in quality_filter(df).collect()]
    assert kept == ["one two three four five six seven eight nine ten eleven"]


def test_training_hygiene_pipeline_stages(spark):
    """Declarative training-data hygiene: scrub -> quality filter ->
    near-dup pairs, end-to-end through a job config."""
    import json

    from arc_spark.pipeline import run_config

    base = "one two three four five six seven eight nine ten eleven"
    rows = [
        (1, f"{base} contact a@b.co"),
        (2, f"{base} contact x@y.org"),   # near-dup of 1 after scrub
        (3, "short"),                      # quality-filtered out
        (4, "totally different words appear in this document here now ok"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").createOrReplaceTempView("hyg_src")
    cfg = {
        "stages": [
            {"type": "TextScrubTransform", "name": "scrub", "inputView": "hyg_src",
             "outputView": "scrubbed"},
            {"type": "QualityFilterTransform", "name": "qf", "inputView": "scrubbed",
             "outputView": "clean", "minTokens": 10},
            {"type": "NearDupTransform", "name": "nd", "inputView": "clean",
             "outputView": "pairs", "method": "minhash", "threshold": 0.5},
            {"type": "DedupClusterTransform", "name": "cc", "inputView": "pairs",
             "outputView": "clusters"},
        ]
    }
    df, _ = run_config(spark, json.dumps(cfg))
    got = [(r["id_a"], r["id_b"]) for r in spark.table("pairs").collect()]
    assert got == [(1, 2)]  # scrub made 1 and 2 near-identical; 3 was gated
    assert spark.table("clean").count() == 3
    clusters = {r["id"]: r["cluster"] for r in df.collect()}
    assert clusters == {1: 1, 2: 1}  # doc 2 collapses onto canonical doc 1


def test_degenerate_bucket_cap_completes_and_logs(spark, caplog):
    """A planted degenerate bucket (2k identical docs) must complete under
    the default cap with the dropped-bucket count logged — never a silent
    quadratic blowup, never silent truncation."""
    import logging

    from arc_spark.operators.dedup import minhash_near_dup, simhash_near_dup

    rows = [(i, "the same boilerplate license header text repeated verbatim")
            for i in range(2000)]
    rows += [(10_000 + i, " ".join(f"w{(i * 31 + j) * 2654435761 % 99991}"
                                   for j in range(12)))
             for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    with caplog.at_level(logging.WARNING, logger="arc_spark.dedup"):
        out = minhash_near_dup(df, "text", "doc_id", num_hashes=16, bands=4,
                               max_bucket_size=100)
        assert out.count() == 0  # the only dups live in dropped buckets
    assert any("degenerate bucket" in r.message for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="arc_spark.dedup"):
        out = simhash_near_dup(df, "text", "doc_id", max_hamming=3, bands=4,
                               max_bucket_size=100)
        assert out.count() == 0
    assert any("degenerate bucket" in r.message for r in caplog.records)


def test_dedup_clusters_transitive(spark):
    """A-B, B-C chain collapses to one cluster labeled min(id); disjoint
    pairs keep their own clusters; convergence handles diameter > 1."""
    from arc_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 9), (20, 30)], "id_a: long, id_b: long"
    )
    got = {r["id"]: r["cluster"] for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 20: 20, 30: 20}


def test_deterministic_sampling_and_mixing(spark):
    """Membership is a pure function of the key: stable under
    repartitioning and row additions; mix tags provenance; splits are
    leakage-free by construction (same key -> same label)."""
    from arc_spark.operators.sampling import (
        deterministic_sample,
        mix_datasets,
        split_train_test,
    )

    df = spark.range(0, 10_000).toDF("k")
    s1 = {r["k"] for r in deterministic_sample(df, 0.3, "k", seed=5).collect()}
    s2 = {r["k"] for r in deterministic_sample(df.repartition(13), 0.3, "k", seed=5).collect()}
    assert s1 == s2 and 0.25 < len(s1) / 10_000 < 0.35
    # appending rows never flips membership of existing keys
    s3 = {r["k"] for r in deterministic_sample(
        spark.range(0, 20_000).toDF("k"), 0.3, "k", seed=5).collect()}
    assert s1 == {k for k in s3 if k < 10_000}
    sp = split_train_test(df, "k", test_fraction=0.2, seed=1)
    frac = sp.filter("split = 'test'").count() / 10_000
    assert 0.17 < frac < 0.23
    mixed = mix_datasets([(df, 1.0), (df, 0.1)], "k")
    counts = {r["source"]: r["count"] for r in mixed.groupBy("source").count().collect()}
    assert counts[0] == 10_000 and 500 < counts[1] < 1500


def test_sample_transform_stage(spark):
    from arc_spark.pipeline import run_config

    spark.range(0, 5000).toDF("k").createOrReplaceTempView("sample_src")
    cfg = {"stages": [
        {"type": "SampleTransform", "name": "s", "inputView": "sample_src",
         "outputView": "sampled", "keyField": "k", "fraction": 0.5,
         "testFraction": 0.2, "seed": 3},
    ]}
    df, _ = run_config(spark, cfg)
    n = df.count()
    assert 2200 < n < 2800 and set(df.columns) == {"k", "split"}
    assert 0.15 < df.filter("split = 'test'").count() / n < 0.25


def test_dedup_end_to_end_keep_and_drop(spark):
    """NearDup → Cluster → Apply as one job config on planted duplicate
    groups: keep retains exactly one representative (the min id) per
    clique plus all unique docs; drop emits the complement."""
    from arc_spark.pipeline import run_config

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = (
        [(i, base + f" v{i % 2}") for i in range(6)]       # clique of 6 (near-dup)
        + [(100 + i, f"totally unrelated document number {i} "
                     f"with distinct words alpha{i} beta{i} gamma{i}") for i in range(4)]
    )
    spark.createDataFrame(rows, "doc_id: long, text: string") \
        .createOrReplaceTempView("e2e_docs")
    cfg = {"stages": [
        {"type": "NearDupTransform", "name": "p", "inputView": "e2e_docs",
         "outputView": "e2e_pairs", "method": "minhash", "numHashes": 16,
         "bands": 16, "threshold": 0.5, "shingleN": 3, "maxBucketSize": 0},
        {"type": "DedupClusterTransform", "name": "c", "inputView": "e2e_pairs",
         "outputView": "e2e_clusters"},
        {"type": "DedupApplyTransform", "name": "k", "inputView": "e2e_docs",
         "clusterView": "e2e_clusters", "outputView": "e2e_kept"},
        {"type": "DedupApplyTransform", "name": "d", "inputView": "e2e_docs",
         "clusterView": "e2e_clusters", "outputView": "e2e_dropped",
         "mode": "drop"},
    ]}
    df, ctx = run_config(spark, cfg)
    kept = {r["doc_id"] for r in ctx.spark.table("e2e_kept").collect()}
    dropped = {r["doc_id"] for r in ctx.spark.table("e2e_dropped").collect()}
    assert kept == {0, 100, 101, 102, 103}  # one rep (min id) + uniques
    assert dropped == {1, 2, 3, 4, 5}
    assert kept | dropped == {r[0] for r in rows} and not kept & dropped


# -- sampling-hash properties. History: the affine 1-round MINSTD hash
#    fully correlated seed streams (commit b2cfe88); the 2-round fix left
#    adjacent-seed correlation; the 3-round fix still carried the MINSTD
#    lattice — hypothesis found seed=14345 with a −10.6% decile wave
#    (≈8σ). The mixer is now murmur3 fmix32 (avalanche-complete), and
#    these properties must not regress on the next formula change.

def _fmix_np(keys, seed):
    """Exact numpy replication of operators.sampling.fmix_hash."""
    import numpy as np

    from arc_spark.operators.sampling import FMIX_C1, FMIX_C2, seed_constant

    def fmix32(h):
        h = np.bitwise_xor(h, h >> 16)
        h = (h * FMIX_C1) & 0xFFFFFFFF
        h = np.bitwise_xor(h, h >> 13)
        h = (h * FMIX_C2) & 0xFFFFFFFF
        return np.bitwise_xor(h, h >> 16)

    k = keys.astype(np.uint64) & 0xFFFFFFFF
    return fmix32(np.bitwise_xor(k, np.uint64(seed_constant(seed)))).astype(
        np.int64
    )


def test_fmix_spark_matches_numpy_replication(spark):
    import numpy as np

    from arc_spark.operators.sampling import fmix32_py, fmix_hash, seed_constant
    from pyspark.sql import functions as F

    keys = np.array([0, 1, 2, 7, 44_000, 44_001, 2**20, 2**30, 2**31 - 2, 2**32 - 1])
    for seed in (0, 11, 99, 7919, 14345):
        df = spark.createDataFrame([(int(k),) for k in keys], "k: long")
        got = [r[0] for r in df.select(fmix_hash(F.col("k"), seed)).collect()]
        want = [int(x) for x in _fmix_np(keys, seed)]
        assert got == want
        # and the scalar reference agrees with both
        assert want == [fmix32_py(int(k) ^ seed_constant(seed)) for k in keys]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(seed=st.integers(min_value=0, max_value=2**20))
    @settings(max_examples=60, deadline=None)
    def test_minstd_uniform_over_seeds(seed):
        """Decile occupancy stays within ±6% of uniform for ANY seed over
        sequential keys (what doc_id columns look like). fmix32 passes
        avalanche, so ±6% at n=50k is ≈4.5σ — a failure here means the
        mixer regressed, not noise. Name kept so the cached seed=14345
        falsifying example (which killed the 3-round MINSTD mixer)
        replays against the new formula."""
        import numpy as np

        n = 50_000
        h = _fmix_np(np.arange(n), seed)
        deciles = np.bincount((h * 10 // (2**32)).astype(int), minlength=10)
        assert deciles.max() <= n / 10 * 1.06 and deciles.min() >= n / 10 * 0.94

    @given(
        s1=st.integers(min_value=0, max_value=2**20),
        delta=st.integers(min_value=1, max_value=2**20),
    )
    @settings(max_examples=60, deadline=None)
    def test_minstd_cross_stream_conditional_matches_marginal(s1, delta):
        """For ANY pair of distinct seeds — INCLUDING adjacent ones,
        which hypothesis shrinks straight to — membership in stream-2's
        10% sample is ~independent of membership in stream-1's 25%
        sample: P(h2<0.1·R | h1<0.25·R) ≈ 0.1. The affine pre-b2cfe88
        formula gives 0 or 1 here; the 2-round MINSTD formula ran ~0.057
        for (s, s+1) pairs."""
        import numpy as np

        R = 2**32
        n = 50_000
        keys = np.arange(n)
        in1 = _fmix_np(keys, s1) < 0.25 * R
        in2 = _fmix_np(keys, s1 + delta) < 0.1 * R
        assert in1.sum() > 0
        cond = in2[in1].mean()
        assert abs(cond - 0.1) < 0.02, (s1, delta, cond)
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_sampling_string_keys_hash_instead_of_null_cast(spark):
    """A string key must NOT silently cast to NULL (which would drop
    every row): it routes through xxhash64 — deterministic, leakage-free
    (all rows of a key land on one side), partition-invariant."""
    from arc_spark.operators.sampling import (
        deterministic_sample, key_to_long, split_train_test,
    )
    from pyspark.sql import functions as F

    rows = [(f"repo{i % 40}/path{i}",) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_key string")
    s = deterministic_sample(df, 0.5, "doc_key", seed=3)
    n = s.count()
    assert 120 < n < 280, n  # ~50%, NOT 0 (the null-cast failure mode)
    # stable under repartitioning
    n2 = deterministic_sample(df.repartition(13), 0.5, "doc_key", seed=3).count()
    assert n == n2
    # split covers every row exactly once and is key-consistent
    sp = split_train_test(df, "doc_key", test_fraction=0.25, seed=7)
    agg = sp.groupBy("doc_key").agg(F.countDistinct("split").alias("k"))
    assert agg.filter(F.col("k") != 1).count() == 0
    assert sp.count() == 400

    import pytest

    with pytest.raises(ValueError, match="sampling key"):
        key_to_long(df.select(F.array(F.lit(1)).alias("a")), "a")
