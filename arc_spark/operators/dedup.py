"""Deduplication operators for training-data pipelines.

- exact:      hash-groupBy keep-min-id (one partial-aggregated shuffle).
- minhash:    shingle → minhash signature → LSH banding → bucket self-join.
- simhash:    64-bit simhash + banded buckets for near-dup candidates.
- ngram_jaccard: exact Jaccard over shingle sets for candidate pairs.
- embedding near-dup: cosine-threshold pairs via arc_spark.operators.similarity.

Scale design: every operator is expressed as DataFrame ops whose only
shuffles are the groupBys/joins listed; candidate generation always goes
through LSH-style bucketing (explode by band → groupBy bucket) so the
cross-product is confined to same-bucket collisions, never a full O(n²)
join. MinHash signatures are computed with JVM-side hash/aggregate
expressions (no Python UDF): h_i(shingle) = xxhash64(shingle, i) and the
signature is the per-row min over the shingle array via F.transform +
F.array_min.

Reference parity: the reference's fuzzy-match operator is
SimilarityJoinTransform (``transform/SimilarityJoinTransform.scala:140-255``)
— chars → NGram → CountVectorizer → MinHashLSH.approxSimilarityJoin. Our
minhash_near_dup implements the same MinHash+LSH algorithm directly in
DataFrame expressions (no MLlib model fit needed, so it scales without a
driver-side vocabulary build — CountVectorizer's vocab is a driver
bottleneck at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact normalized-text value.

    groupBy on a 128-bit text fingerprint → partial aggregation map-side;
    the full text never shuffles, only (fp128, min_id).

    128 bits, not 64: at the 10^10-document design scale a single 64-bit
    key has O(1-10) expected birthday collisions (silently merging
    non-duplicates); two independent xxhash64 values push the collision
    odds to ~1e-19 while keeping the shuffled key a thin 16 bytes
    (vs 32+ for an md5/sha hex string).
    """
    norm = F.trim(F.lower(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    keyed = df.withColumn("_fp1", F.xxhash64(norm)).withColumn(
        "_fp2", F.xxhash64(norm, F.lit(0x5F3C))
    )
    keep = keyed.groupBy("_fp1", "_fp2").agg(F.min(id_col).alias(id_col))
    return keyed.join(keep, [id_col, "_fp1", "_fp2"], "left_semi").drop("_fp1", "_fp2")


# ---------------------------------------------------------------------------
# shingling + minhash
# ---------------------------------------------------------------------------


def _shingles(c: Column, n: int, mode: str = "word") -> Column:
    """Array of distinct n-gram shingles of the normalized text.

    ``word`` (default): n-grams of whitespace tokens — the standard for
    document near-dup (à la CCNet/C4 dedup) and ~20-30x fewer set elements
    than char shingles on prose, which directly scales the minhash/simhash
    cost. ``char``: sliding character n-grams (better for short strings /
    fuzzy identifiers — what the reference's SimilarityJoinTransform uses
    via NGram over characters)."""
    norm = F.trim(F.lower(F.regexp_replace(c, r"\s+", " ")))
    if mode == "char":
        idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1)))
        return F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(n))))
    words = F.split(norm, " ")
    count = F.greatest(F.size(words) - (n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), count)
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    )


def shingle_hashes(c: Column, shingle_n: int = 3, mode: str = "word") -> Column:
    """xxhash64 of each distinct shingle — computed ONCE; minhash functions
    then rehash these longs (cheap) instead of re-hashing strings."""
    return F.transform(_shingles(c, shingle_n, mode), lambda s: F.xxhash64(s))


def minhash_signature_from_hashes(hashes: Column, num_hashes: int) -> Column:
    """Array of ``num_hashes`` minhash values over a pre-computed shingle
    hash array: sig[i] = min over h of xxhash64(h, i) (a 64-bit universal
    rehash of a long — no string re-hashing, no shingle re-computation)."""

    def _h(i: int):
        # closure factory — a defaulted `i=i` lambda parameter would make
        # pyspark pass the array index instead (2-arg transform lambda)
        return lambda h: F.xxhash64(h, F.lit(i))

    return F.array(*[F.array_min(F.transform(hashes, _h(i))) for i in range(num_hashes)])


def minhash_signature(
    c: Column, num_hashes: int, shingle_n: int = 3, mode: str = "word"
) -> Column:
    """Array of ``num_hashes`` minhash values for a text column."""
    return minhash_signature_from_hashes(shingle_hashes(c, shingle_n, mode), num_hashes)


def minhash_near_dup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    shingle_mode: str = "word",
    jaccard_threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding.

    Pipeline: signature (map-only) → explode band buckets → groupBy bucket
    self-pairs → estimate Jaccard from full signatures → threshold.
    Returns (id_a, id_b, jaccard_est) with id_a < id_b.

    ``max_bucket_size`` drops degenerate buckets (boilerplate text) whose
    self-join would be quadratic — see similarity._cap_buckets.
    """
    rows_per_band = num_hashes // bands
    # two selects so the shingle-hash array materializes once per row —
    # a single minhash_signature(text) expression would re-shingle the
    # text for every one of the num_hashes array_min branches
    sig = df.select(
        F.col(id_col).alias("id"),
        shingle_hashes(F.col(text_col), shingle_n, shingle_mode).alias("_sh"),
    ).select(
        "id",
        minhash_signature_from_hashes(F.col("_sh"), num_hashes).alias("sig"),
    )
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.element_at(F.col("sig"), b * rows_per_band + r + 1) for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")
    if max_bucket_size:
        from arc_spark.operators.similarity import _cap_buckets

        banded = _cap_buckets(banded, ["band", "bucket"], max_bucket_size)

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    jac = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda m: m,
            )
        ).cast("double")
        / F.lit(float(num_hashes))
    )
    return (
        pairs.withColumn("jaccard_est", jac)
        .filter(F.col("jaccard_est") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard_est")
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash64(c: Column, shingle_n: int = 2, mode: str = "word") -> Column:
    """64-bit simhash: per bit, sign of the sum over shingles of ±1 from
    that shingle's hash bit.

    One pass over the shingle array: the accumulator is an array of 64
    vote counters updated via zip_with + bit_get (64 cheap ops per
    shingle, a single aggregate — NOT 64 aggregates, which explodes the
    codegen tree and falls back to interpreted eval).
    """
    sh = _shingles(c, shingle_n, mode)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    bit_idx = F.sequence(F.lit(0), F.lit(63))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(bit_idx, lambda b: F.bit_get(h, b).cast("int")),
            lambda a, bit: a + bit * 2 - 1,
        ),
    )
    # bit weights as longs; bit 63 is the (negative) sign-bit value
    powers = F.array(
        *[F.lit(1 << i if i < 63 else -(1 << 63)).cast("long") for i in range(64)]
    )
    bits = F.zip_with(
        votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)


def simhash_near_dup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 8,
    bands: int = 4,
    shingle_n: int = 2,
    shingle_mode: str = "word",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs whose simhash Hamming distance ≤ ``max_hamming``.

    Candidate generation: split the 64-bit hash into ``bands`` equal-width
    chunks; by pigeonhole, any pair within Hamming distance < bands must
    agree on ≥1 chunk → join on (band, chunk), then verify exact Hamming
    distance via bit_count(xor). With bands > max_hamming the candidate
    set provably contains EVERY pair within max_hamming (recall 1).
    """
    width = 64 // bands
    mask = (1 << width) - 1
    sig = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col), shingle_n, shingle_mode).alias("sh"))
    banded = sig.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sh"), b * width).bitwiseAND(F.lit(mask)).alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sh", "bb.band", "bb.chunk")
    if max_bucket_size:
        from arc_spark.operators.similarity import _cap_buckets

        banded = _cap_buckets(banded, ["band", "chunk"], max_bucket_size)
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verification pass for candidate pairs)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    shingle_mode: str = "word",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard over character-shingle sets for (id_a, id_b) candidate
    pairs (the verify stage after minhash/simhash candidate generation)."""
    sh = df.select(
        F.col(id_col).alias("id"), _shingles(F.col(text_col), shingle_n, shingle_mode).alias("sh")
    )
    j = (
        candidate_pairs.join(sh.withColumnRenamed("sh", "sh_a"), F.col("id_a") == F.col("id"))
        .drop("id")
        .join(sh.withColumnRenamed("sh", "sh_b"), F.col("id_b") == F.col("id"))
        .drop("id")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double")
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))).cast("double")
    return (
        j.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
