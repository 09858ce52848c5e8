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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# In-bucket candidate-pair expansion: ids arrive SORTED, so slice-after-i
# yields each (x, y) with x < y exactly once. groupBy+expand replaces a
# banded SELF-JOIN — a self-join scans and recomputes the signature
# pipeline for BOTH sides; this shape computes signatures once and
# shuffles only thin (bucket, ids) rows.
_PAIR_EXPAND = (
    "flatten(transform({ids}, (x, i) -> "
    "transform(slice({ids}, i + 2, size({ids})), y -> struct(x AS a, y AS b))))"
)


def _bucket_pairs(
    banded: DataFrame,
    bucket_cols: list[str],
    elem,
    max_bucket_size: int | None,
    *,
    method: str = "expand",
) -> DataFrame:
    """Distinct candidate pairs (a, b with a < b) of ``elem`` values that
    share a bucket; buckets above ``max_bucket_size`` are dropped (the
    degenerate-bucket guard — one boilerplate bucket is otherwise
    quadratic).

    ``method``: "expand" groups each bucket into an array and expands
    in-bucket pairs with expressions — one scan, best when buckets are
    SMALL (near-dup text banding: a handful of ids per bucket). "join"
    self-joins the thin banded rows — best when buckets are LARGE (e.g.
    few-bit hyperplane buckets holding n/2^k rows: building 10^4+-struct
    arrays per group is interpreted and slow, while the hash join streams;
    only use when recomputing ``banded`` twice is cheap, i.e. it derives
    from a persisted/materialized table)."""
    if method == "join":
        if max_bucket_size:
            ok = (
                banded.groupBy(*bucket_cols)
                .agg(F.count(F.lit(1)).alias("_bs"))
                .filter(F.col("_bs") <= max_bucket_size)
                .drop("_bs")
            )
            banded = banded.join(ok, bucket_cols, "left_semi")
        left = banded.select(*bucket_cols, elem.alias("a")).alias("L")
        right = banded.select(*bucket_cols, elem.alias("b")).alias("R")
        cond = None
        for c in bucket_cols:
            eq = F.col(f"L.{c}") == F.col(f"R.{c}")
            cond = eq if cond is None else (cond & eq)
        cond = cond & (F.col("L.a") < F.col("R.b"))
        return left.join(right, cond).select("a", "b").dropDuplicates(["a", "b"])

    g = banded.groupBy(*bucket_cols).agg(F.sort_array(F.collect_set(elem)).alias("ids"))
    g = g.filter(F.size("ids") >= 2)
    if max_bucket_size:
        g = g.filter(F.size("ids") <= max_bucket_size)
    return (
        g.select(F.explode(F.expr(_PAIR_EXPAND.format(ids="ids"))).alias("p"))
        .select("p.a", "p.b")
        .dropDuplicates(["a", "b"])
    )

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


def _bind(col: Column, fn) -> Column:
    """Evaluate ``col`` ONCE per row and pass the bound value to ``fn``.

    Catalyst inlines plain column references into transform lambdas, so an
    expression like ``transform(seq, i -> slice(split(norm), i, n))``
    re-evaluates the whole split/regexp subtree at EVERY lambda iteration
    (measured ~50x redundant work per doc). Routing the subtree through a
    single-element array + lambda variable forces one evaluation.
    """
    return F.element_at(F.transform(F.array(col), fn), 1)


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
        return _bind(
            norm,
            lambda nm: F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length(nm) - (n - 1), F.lit(1))),
                    lambda i: nm.substr(i, F.lit(n)),
                )
            ),
        )
    return _bind(
        F.split(norm, " "),
        lambda ws: F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(ws) - (n - 1), F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
            )
        ),
    )


def shingle_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    shingle_mode: str = "word",
) -> DataFrame:
    """(id, sh: array<string>) shingle table — compute (and persist) once,
    share between candidate generation and the exact-verify stage."""
    return df.select(
        F.col(id_col).alias("id"),
        _shingles(F.col(text_col), shingle_n, shingle_mode).alias("sh"),
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
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding.

    ``shingles_df``: optional precomputed (id, sh: array<string>) table
    (from ``shingle_table``) — lets a pipeline share ONE shingling pass
    between candidate generation and the exact-Jaccard verify stage.

    Pipeline: signature (map-only) → explode band buckets → groupBy bucket
    self-pairs → estimate Jaccard from full signatures → threshold.
    Returns (id_a, id_b, jaccard_est) with id_a < id_b.

    ``max_bucket_size`` drops degenerate buckets (boilerplate text) whose
    self-join would be quadratic — see _bucket_pairs.
    """
    rows_per_band = num_hashes // bands
    # two selects so the shingle-hash array materializes once per row —
    # a single minhash_signature(text) expression would re-shingle the
    # text for every one of the num_hashes array_min branches
    if shingles_df is not None:
        hashed = shingles_df.select(
            "id", F.transform(F.col("sh"), lambda s: F.xxhash64(s)).alias("_sh")
        )
    else:
        hashed = df.select(
            F.col(id_col).alias("id"),
            shingle_hashes(F.col(text_col), shingle_n, shingle_mode).alias("_sh"),
        )
    sig = hashed.select(
        "id",
        minhash_signature_from_hashes(F.col("_sh"), num_hashes).alias("sig"),
    )
    # the signature table is referenced by the banding pass AND both sides
    # of the estimate join-back — persist it (thin: id + 16 longs) so the
    # shingle/signature pipeline runs exactly once
    sig = sig.persist()
    banded = sig.select(
        "id",
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
    ).select("id", "bb.band", "bb.bucket")
    pairs = _bucket_pairs(banded, ["band", "bucket"], F.col("id"), max_bucket_size).select(
        F.col("a").alias("id_a"), F.col("b").alias("id_b")
    )
    # late materialization: the signature joins back onto the (small)
    # deduped pair set for the estimate, instead of riding every banded row
    sa = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
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
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard_est", jac)
        .filter(F.col("jaccard_est") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard_est")
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def _simhash_from_hashes_udf():
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def _simhash(hash_arrays: pd.Series) -> pd.Series:
        out = np.zeros(len(hash_arrays), dtype=np.uint64)
        bitsel = np.uint64(1) << np.arange(64, dtype=np.uint64)
        for i, arr in enumerate(hash_arrays):
            if arr is None or len(arr) == 0:
                continue
            h = np.asarray(arr, dtype=np.int64).view(np.uint64)
            # (n_shingles, 64) bit matrix -> per-bit vote sums
            bits = (h[:, None] & bitsel[None, :]) != 0
            votes = 2 * bits.sum(axis=0, dtype=np.int64) - len(h)
            out[i] = (bitsel[votes > 0]).sum(dtype=np.uint64)
        return pd.Series(out.view(np.int64))

    return _simhash


def simhash64(c: Column, shingle_n: int = 2, mode: str = "word") -> Column:
    """64-bit simhash: per bit, sign of the sum over shingles of ±1 from
    that shingle's hash bit.

    Shingling + xxhash64 stay JVM-side; the 64-lane bit voting runs as ONE
    Arrow-batched numpy kernel (a (shingles × 64) bit matrix per row).
    The earlier pure-expression form (zip_with + bit_get folded over the
    shingle array) is interpreted per element by Catalyst and measured
    ~10x slower at 5k docs — exactly the 'Pandas UDFs beat per-element
    expression trees for wide numeric kernels' tradeoff.
    """
    sh = _shingles(c, shingle_n, mode)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    return _simhash_from_hashes_udf()(hashes)


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
    # the Arrow UDF's argument must be a PLAIN column: handed the
    # higher-order transform(...) expression (which CollapseProject will
    # re-inline across selects, and the cache manager may substitute
    # into), planner extraction fails with INTERNAL_ERROR: Cannot
    # generate code for expression: _simhash. localCheckpoint truncates
    # the lineage at the shingle-hash level so the UDF always sits in a
    # plain projection over a materialized relation.
    hashes = df.select(
        F.col(id_col).alias("id"),
        shingle_hashes(F.col(text_col), shingle_n, shingle_mode).alias("_sh"),
    ).localCheckpoint(eager=False)
    sig = hashes.select("id", _simhash_from_hashes_udf()(F.col("_sh")).alias("sh"))
    banded = sig.select(
        F.struct("id", "sh").alias("e"),
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
    ).select("e", "bb.band", "bb.chunk")
    # the signature is one long, so it rides the bucket rows; pairs carry
    # both signatures out of the groupBy for the exact Hamming verify
    pairs = _bucket_pairs(banded, ["band", "chunk"], F.col("e"), max_bucket_size)
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


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
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard over character-shingle sets for (id_a, id_b) candidate
    pairs (the verify stage after minhash/simhash candidate generation).

    ``shingles_df``: optional precomputed (id, sh) table shared with the
    candidate-generation stage (see ``shingle_table``)."""
    # both pair sides join against the shingle table — persist so the
    # shingling pipeline runs once
    sh = shingles_df if shingles_df is not None else shingle_table(
        df, text_col, id_col, shingle_n=shingle_n, shingle_mode=shingle_mode
    ).persist()
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
