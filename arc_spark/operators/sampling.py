"""Deterministic sampling / splitting / mixing for training-data curation.

Training pipelines need samples and splits that are (a) reproducible on
any cluster size and partitioning, (b) stable across reruns when data is
appended (a row's membership never flips), and (c) leakage-free (all
rows of a key land on the same side). ``df.sample()`` satisfies none of
these — it is seeded per-partition. Everything here derives membership
from a pure-integer hash of the KEY:

    h(k) = minstd( minstd(k + seed) XOR mix(seed) ),
    minstd(x) = (x mod M)·A mod M,  M = 2^31-1, A = 48271,
    mix(seed) = seed·2654435761 mod 2^31

Two MINSTD rounds with a seed-derived XOR between them. Each piece is
load-bearing: one multiply never wraps the modulus for keys below M/A
(~44k), leaving the "hash" linear-in-key; and WITHOUT the XOR,
h(k, seed) = (k+seed)·A² mod M is affine in k, so two seeds differ by a
constant shift — "independent" streams would be fully correlated (a
test split of a sample could be 0% or 100% instead of testFraction;
caught by test_sample_transform_stage). The XOR breaks the affinity;
measured deciles over 100k keys are uniform and cross-stream
conditional rates match the marginals. Every step stays exactly
representable in 64-bit integer arithmetic (no overflow under ANSI
mode) and is replicable verbatim in any engine for oracle checks (the
DuckDB oracles in __spark_entry__ run the same formula).

Scale: every operator is a stateless per-row projection + filter — no
shuffle, no driver state; membership pushes down to scans as an ordinary
predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MINSTD_M = 2**31 - 1
MINSTD_A = 48271


def minstd_hash(key: Column, seed: int = 0) -> Column:
    """minstd(minstd(key+seed) XOR mix(seed)) — uniform on [0, M), with
    genuinely decorrelated streams across seeds (see module docstring)."""
    mix = (int(seed) * 2654435761) % (2**31)
    k = F.pmod(key.cast("long") + F.lit(int(seed)), F.lit(MINSTD_M))
    h1 = F.pmod(k * F.lit(MINSTD_A), F.lit(MINSTD_M))
    h1x = h1.bitwiseXOR(F.lit(mix))
    return F.pmod(F.pmod(h1x, F.lit(MINSTD_M)) * F.lit(MINSTD_A), F.lit(MINSTD_M))


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str,
    *,
    seed: int = 0,
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership a pure function of the key:
    rerunning, repartitioning, or appending other rows never changes
    which keys are in the sample."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(fraction * MINSTD_M)
    return df.filter(minstd_hash(F.col(key_col), seed) < F.lit(threshold))


def split_train_test(
    df: DataFrame,
    key_col: str,
    *,
    test_fraction: float = 0.1,
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Leakage-free split: every row of a key gets the same label, so a
    document (or user, or repo) can never straddle train and test."""
    threshold = int(test_fraction * MINSTD_M)
    return df.withColumn(
        split_col,
        F.when(
            minstd_hash(F.col(key_col), seed) < F.lit(threshold), F.lit("test")
        ).otherwise(F.lit("train")),
    )


def mix_datasets(
    sources: list[tuple[DataFrame, float]],
    key_col: str,
    *,
    seed: int = 0,
    source_col: str = "source",
) -> DataFrame:
    """Weighted corpus mix: deterministically sample each source at its
    fraction and union with a provenance tag — the 'data recipe' step of
    a training pipeline (e.g. 100% wiki + 30% web + 5% forums). Columns
    are aligned by name; each source gets an independent hash stream
    (seed offset) so the same key in two sources is sampled
    independently."""
    parts = []
    for i, (df, fraction) in enumerate(sources):
        s = deterministic_sample(df, fraction, key_col, seed=seed + i * 7919)
        parts.append(s.withColumn(source_col, F.lit(i)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
