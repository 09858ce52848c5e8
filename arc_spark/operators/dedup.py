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
join. Shingling + per-shingle xxhash64 stay JVM-side; the wide numeric
kernels (minhash minima over all lanes, simhash bit voting) run as single
Arrow-batched numpy UDFs — higher-order expressions are interpreted per
element by Catalyst and measured ~10x slower for both.

Reference parity: the reference's fuzzy-match operator is
SimilarityJoinTransform (``transform/SimilarityJoinTransform.scala:140-255``)
— chars → NGram → CountVectorizer → MinHashLSH.approxSimilarityJoin. Our
minhash_near_dup implements the same MinHash+LSH algorithm directly in
DataFrame expressions (no MLlib model fit needed, so it scales without a
driver-side vocabulary build — CountVectorizer's vocab is a driver
bottleneck at 100 TB).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_log = logging.getLogger("arc_spark.dedup")

#: default degenerate-bucket guard: buckets above this size are dropped
#: (with a logged count — never silently). A boilerplate bucket of b rows
#: expands b²/2 candidate pairs; at 10^10 docs one 10M-row bucket of
#: license headers would emit 5·10^13 pairs and dominate the whole job.
#: Callers needing provable recall (oracle configs) pass
#: ``max_bucket_size=None`` explicitly.
DEFAULT_MAX_BUCKET_SIZE = 10_000

# In-bucket candidate-pair expansion: ids arrive SORTED, so slice-after-i
# yields each (x, y) with x < y exactly once. groupBy+expand replaces a
# banded SELF-JOIN — a self-join scans and recomputes the signature
# pipeline for BOTH sides; this shape computes signatures once and
# shuffles only thin (bucket, ids) rows.
_PAIR_EXPAND = (
    "flatten(transform({ids}, (x, i) -> "
    "transform(slice({ids}, i + 2, size({ids})), y -> struct(x AS a, y AS b))))"
)


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input arrives
    in fewer partitions — file bin-packing sizes scan partitions by BYTES,
    so a small-but-CPU-dense input (shingling, hash kernels over short
    docs) can land on 1-2 tasks and serialize the whole stage. A no-op
    when the input already has enough partitions (the 100 TB case: scans
    arrive with thousands), so the one-time shuffle of raw rows only
    happens when it is amortized by per-row compute that dwarfs it."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


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
    from a persisted/materialized table).

    Dropped buckets are COUNTED and logged (one extra thin action over the
    already-aggregated bucket sizes) — a cap must never silently truncate."""
    if method == "join":
        if max_bucket_size:
            sizes = (
                banded.groupBy(*bucket_cols)
                .agg(F.count(F.lit(1)).alias("_bs"))
                .persist()
            )
            dropped = sizes.filter(F.col("_bs") > max_bucket_size).count()
            if dropped:
                _log.warning(
                    "near-dup bucketing: dropped %d degenerate bucket(s) larger "
                    "than max_bucket_size=%d", dropped, max_bucket_size
                )
            ok = sizes.filter(F.col("_bs") <= max_bucket_size).drop("_bs")
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
        g = g.persist()
        dropped = g.filter(F.size("ids") > max_bucket_size).count()
        if dropped:
            _log.warning(
                "near-dup bucketing: dropped %d degenerate bucket(s) larger "
                "than max_bucket_size=%d", dropped, max_bucket_size
            )
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

    Independence requires the salt to come FIRST: Spark chains
    multi-argument xxhash64 left-to-right with each result seeding the
    next, so ``xxhash64(norm, salt)`` is a pure function of
    ``xxhash64(norm)`` (any _fp1 collision would imply an _fp2 collision,
    collapsing the key back to 64 bits). ``xxhash64(salt, norm)`` instead
    hashes the text under a different effective seed.

    The keep set's semi join-back matches on the representative id ALONE
    (the former (id, fp128) join key forced the normalize+hash chain to
    run a second time over the full left side — one regex pass per row of
    pure recompute). The winner pass now reads only (id, text) (Parquet
    column pruning) and the fat rows join back untouched. REQUIRES
    ``id_col`` to be a unique row identity — with duplicated ids every
    row sharing a kept id survives (dedup without a usable identity is
    undefined; all in-repo corpora key rows uniquely).
    """
    norm = F.trim(F.lower(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    thin = df.select(
        F.col(id_col).alias("_did"),
        F.xxhash64(norm).alias("_fp1"),
        F.xxhash64(F.lit(0x5F3C), norm).alias("_fp2"),
    )
    keep = thin.groupBy("_fp1", "_fp2").agg(F.min("_did").alias("_did"))
    return df.join(
        keep.select("_did"), F.col(id_col) == F.col("_did"), "left_semi"
    )


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
    return spread(df).select(
        F.col(id_col).alias("id"),
        _shingles(F.col(text_col), shingle_n, shingle_mode).alias("sh"),
    )


def hashed_shingle_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    shingle_mode: str = "word",
) -> DataFrame:
    """(id, sh: array<long>) HASHED shingle table (xxhash64 per distinct
    shingle), spread across the cluster. The preferred shared table for
    candidate generation + exact-verify: Jaccard over 8-byte longs avoids
    shuffling/intersecting the string shingles entirely (intersection
    sizes are exact up to a ~|set|²/2^64 collision probability).

    PERSIST the result when sharing across stages (all in-repo callers
    do): the InMemoryRelation is then also the materialization barrier
    that keeps downstream Arrow kernels' arguments plain columns — the
    former extra ``localCheckpoint`` here double-cached the same rows
    (RDD cache + InMemoryRelation) and cost one more pass per query."""
    # spread the RAW rows first: placed after the projection, the
    # repartition would leave the shingling itself in the (possibly
    # 1-task) scan stage and only spread downstream work
    return spread(df).select(
        F.col(id_col).alias("id"),
        shingle_hashes(F.col(text_col), shingle_n, shingle_mode).alias("sh"),
    )


def shingle_hashes(c: Column, shingle_n: int = 3, mode: str = "word") -> Column:
    """xxhash64 of each distinct shingle — computed ONCE; minhash functions
    then rehash these longs (cheap) instead of re-hashing strings.

    Word mode hashes each TOKEN once and combines the n consecutive word
    hashes with one multi-argument ``xxhash64(h_i, …, h_{i+n-1})`` per
    shingle — no shingle *string* is ever built. The former
    ``concat_ws(slice(...))`` form allocated a string per shingle and
    re-hashed every word n times; the word-hash form measured ~2x faster
    steady-state and ~7x cheaper on the first (codegen-cold) run at
    sf0.1. Hash VALUES differ from the string form, but every consumer
    (minhash signatures, simhash votes, hashed-Jaccard intersections) is
    a symmetric function of the same family — outputs stay oracle-exact
    (re-verified at sf0.001/0.01/0.1). Trailing shingles shorter than n
    hash the available word hashes (xxhash64 skips the out-of-range
    NULLs), mirroring the string form's short ``slice``. One deliberate
    edge difference: a NULL text now hashes to its own singleton class
    (the all-NULL xxhash64 seed value) instead of aliasing the
    empty-string shingle as the old ``concat_ws``-over-NULL form did —
    NULL and "" no longer near-dup-match each other."""
    if mode == "char":
        return F.transform(_shingles(c, shingle_n, mode), lambda s: F.xxhash64(s))
    norm = F.trim(F.lower(F.regexp_replace(c, r"\s+", " ")))
    return _bind(
        F.transform(F.split(norm, " "), lambda w: F.xxhash64(w)),
        lambda wh: F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size(wh) - (shingle_n - 1), F.lit(1))
                ),
                # try_element_at: a doc shorter than n words hashes only
                # its available word hashes (xxhash64 skips the NULLs);
                # plain element_at would THROW under ANSI mode
                lambda i: F.xxhash64(
                    *[F.try_element_at(wh, i + k) for k in range(shingle_n)]
                ),
            )
        ),
    )


def minhash_signature_from_hashes(hashes: Column, num_hashes: int) -> Column:
    """Array of ``num_hashes`` minhash values over a pre-computed shingle
    hash array: sig[i] = min over h of xxhash64(i, h) (a 64-bit universal
    rehash of a long — no string re-hashing, no shingle re-computation;
    salt FIRST so each lane runs under a distinct effective seed).

    Pure-expression variant — prefer ``minhash_from_hashes_udf`` in hot
    paths: higher-order functions are interpreted per element by Catalyst,
    so the ``num_hashes`` array_min passes here cost ~10x the single numpy
    kernel (same measured tradeoff as simhash bit voting)."""

    def _h(i: int):
        # closure factory — a defaulted `i=i` lambda parameter would make
        # pyspark pass the array index instead (2-arg transform lambda)
        return lambda h: F.xxhash64(F.lit(i), h)

    return F.array(*[F.array_min(F.transform(hashes, _h(i))) for i in range(num_hashes)])


def minhash_from_hashes_udf(num_hashes: int, seed: int = 0x2545F491):
    """Arrow-batched numpy minhash kernel: ONE pass computes all
    ``num_hashes`` minima per row via a (shingles × num_hashes)
    multiply-add rehash matrix — ``g_i(h) = (a_i·h + b_i) mod 2^64`` with
    seeded odd multipliers (a standard universal family over the 64-bit
    ring). Replaces ``num_hashes`` interpreted array_min(transform(...))
    expression passes (~10x, same tradeoff measured for simhash).

    The returned UDF's argument must be a PLAIN column over a materialized
    relation (localCheckpoint below the UDF) — see simhash_near_dup for
    the CollapseProject extraction trap this avoids.

    The (A, B) constants are drawn on the driver at closure creation and
    serialized with the UDF, so signatures are identical on any cluster
    size / partitioning.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    rng = np.random.RandomState(seed)
    A = (rng.randint(0, 2**62, size=num_hashes).astype(np.uint64) * np.uint64(2)
         + np.uint64(1))
    B = rng.randint(0, 2**62, size=num_hashes).astype(np.uint64)
    _empty = np.full(num_hashes, 2**63 - 1, dtype=np.int64)

    @pandas_udf(ArrayType(LongType()))
    def _minhash(hash_arrays: pd.Series) -> pd.Series:
        out = []
        for arr in hash_arrays:
            if arr is None or len(arr) == 0:
                out.append(_empty)
                continue
            h = np.asarray(arr, dtype=np.int64).view(np.uint64)
            m = (h[:, None] * A[None, :] + B[None, :]).min(axis=0)
            out.append(m.view(np.int64))
        return pd.Series(out)

    return _minhash


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
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    shingles_df: DataFrame | None = None,
    hashes_df: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding.

    ``hashes_df``: optional precomputed (id, sh: array<long>) table (from
    ``hashed_shingle_table``, persisted) — ONE shingle+hash pass shared
    between candidate generation and the exact-verify stage, with no
    string arrays ever persisted. ``shingles_df`` is the older string
    variant (from ``shingle_table``).

    ``jaccard_threshold <= 0`` skips the signature join-back entirely
    (callers that exact-verify every candidate anyway don't pay for the
    estimate) — jaccard_est is null in that case.

    Pipeline: signature (map-only) → explode band buckets → groupBy bucket
    self-pairs → estimate Jaccard from full signatures → threshold.
    Returns (id_a, id_b, jaccard_est) with id_a < id_b.

    ``max_bucket_size`` drops degenerate buckets (boilerplate text) whose
    self-join would be quadratic — see _bucket_pairs.
    """
    rows_per_band = num_hashes // bands
    # two selects so the shingle-hash array materializes once per row —
    # and localCheckpoint keeps the Arrow kernel's argument a plain column
    # over a materialized relation (see simhash_near_dup for the
    # CollapseProject extraction trap)
    if hashes_df is not None:
        hashed = hashes_df.select("id", F.col("sh").alias("_sh"))
    elif shingles_df is not None:
        hashed = spread(shingles_df).select(
            "id", F.transform(F.col("sh"), lambda s: F.xxhash64(s)).alias("_sh")
        ).localCheckpoint(eager=False)
    else:
        hashed = spread(df).select(
            F.col(id_col).alias("id"),
            shingle_hashes(F.col(text_col), shingle_n, shingle_mode).alias("_sh"),
        ).localCheckpoint(eager=False)
    sig = hashed.select(
        "id",
        minhash_from_hashes_udf(num_hashes)(F.col("_sh")).alias("sig"),
    )
    # persist ONLY when the estimate join-back will reference the
    # signature again (threshold > 0: banding + both join-back sides).
    # At threshold <= 0 the signatures flow through the banding exactly
    # once and a cache build would be a pure extra pass.
    if jaccard_threshold > 0:
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
    if jaccard_threshold <= 0:
        return pairs.withColumn("jaccard_est", F.lit(None).cast("double"))
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


def _simhash_kernel(hash_arrays) -> np.ndarray:
    """Shared numpy simhash bit-voting kernel over an iterable of shingle
    hash arrays → int64 simhash per row (0 for empty/null)."""
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
    return out.view(np.int64)


def _simhash_rows(batches):
    """mapInPandas form of the simhash kernel: (id, _sh) → (id, sh)."""
    for pdf in batches:
        yield pd.DataFrame(
            {"id": pdf["id"], "sh": _simhash_kernel(pdf["_sh"].tolist())}
        )


def _simhash_from_hashes_udf():
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def _simhash(hash_arrays: pd.Series) -> pd.Series:
        return pd.Series(_simhash_kernel(hash_arrays.tolist()))

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
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """Near-dup pairs whose simhash Hamming distance ≤ ``max_hamming``.

    Candidate generation: split the 64-bit hash into ``bands`` equal-width
    chunks; by pigeonhole, any pair within Hamming distance < bands must
    agree on ≥1 chunk → join on (band, chunk), then verify exact Hamming
    distance via bit_count(xor). With bands > max_hamming the candidate
    set provably contains EVERY pair within max_hamming (recall 1).

    Scale note: chunk width is 64/bands bits, so each band has only
    2^(64/bands) buckets — at bands=16 that is 16 buckets/band and
    in-bucket comparisons grow QUADRATICALLY with corpus size (measured:
    10x docs → 100x comparisons → 8.4x wall, BASELINE.md round-3 probe).
    The defaults (bands=4 → 16-bit chunks) are the production shape;
    wide-band recall-1 configs are for small-corpus verification.
    """
    width = 64 // bands
    mask = (1 << width) - 1
    # mapInPandas instead of a pandas_udf inside a Project: the kernel is
    # its own operator, so no CollapseProject can re-inline the
    # higher-order shingle transform into a UDF argument (the old
    # INTERNAL_ERROR extraction trap) — which means NO materialization
    # barrier (the former localCheckpoint cost one extra cached pass over
    # the fat shingle arrays per query). Persist the thin (id, sh)
    # signature: banding references it on BOTH join sides, so the
    # shingle+kernel pipeline runs exactly once.
    hashes = spread(df).select(
        F.col(id_col).alias("id"),
        shingle_hashes(F.col(text_col), shingle_n, shingle_mode).alias("_sh"),
    )
    # output schema derives the id type from the input (string doc ids
    # are legal); only the simhash itself is pinned to long
    from pyspark.sql.types import LongType, StructField, StructType

    sig_schema = StructType(
        [hashes.schema["id"], StructField("sh", LongType())]
    )
    sig = hashes.mapInPandas(_simhash_rows, sig_schema).persist()
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
        sizes = (
            banded.groupBy("band", "chunk")
            .agg(F.count(F.lit(1)).alias("_bs"))
            .persist()
        )
        dropped = sizes.filter(F.col("_bs") > max_bucket_size).count()
        if dropped:
            _log.warning(
                "simhash banding: dropped %d degenerate bucket(s) larger "
                "than max_bucket_size=%d", dropped, max_bucket_size
            )
        ok = sizes.filter(F.col("_bs") <= max_bucket_size).drop("_bs")
        banded = banded.join(ok, ["band", "chunk"], "left_semi")
    # pair via a thin self-JOIN, not array expansion: few-bit chunks give
    # LARGE buckets (e.g. 16 bands over 64 bits → 4-bit chunks → n/16 rows
    # per bucket), and building O(bucket²) struct arrays per group is
    # interpreted; here the Hamming verify sits IN the join condition so
    # the quadratic in-bucket comparisons stream through codegen and only
    # true near-dups reach the dropDuplicates shuffle
    left = banded.alias("L")
    right = banded.alias("R")
    cond = (
        (F.col("L.band") == F.col("R.band"))
        & (F.col("L.chunk") == F.col("R.chunk"))
        & (F.col("L.id") < F.col("R.id"))
        & (F.bit_count(F.col("L.sh").bitwiseXOR(F.col("R.sh"))) <= max_hamming)
    )
    return (
        left.join(right, cond)
        .select(
            F.col("L.id").alias("id_a"),
            F.col("R.id").alias("id_b"),
            F.bit_count(F.col("L.sh").bitwiseXOR(F.col("R.sh"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


# ---------------------------------------------------------------------------
# duplicate clustering (connected components over near-dup pairs)
# ---------------------------------------------------------------------------


def dedup_clusters(
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over a near-dup pair graph: returns
    (id, cluster) where ``cluster`` is the MINIMUM id reachable from
    ``id`` — the canonical representative. The keep-set of a dedup
    pipeline is then ``docs semi-join (id == cluster)`` (keep reps) or
    ``docs anti-join (id != cluster)`` (drop the rest).

    Algorithm: iterative min-label propagation (the alternating
    small-star/large-star MapReduce CC reduces to this on undirected
    edges): every node starts labeled with itself; each round joins
    labels across edges and keeps the per-node minimum; converges in
    O(diameter) rounds — near-dup graphs are unions of small cliques, so
    diameter is tiny and each round is one shuffle join + one groupBy
    over the (thin) edge list. The label frontier is localCheckpointed
    per round to keep the plan linear instead of 2^rounds.

    Driver work per round is ONE count (convergence check); no vertex
    data ever collects.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .dropDuplicates(["id"])
        .withColumn("cluster", F.col("id"))
        .localCheckpoint(eager=False)
    )
    changed = 0
    for _ in range(max_iter):
        # neighbor minimum: for each dst, the smallest label among its
        # neighbors' current labels
        neigh = (
            edges.join(labels, edges.src == labels.id)
            .groupBy("dst")
            .agg(F.min("cluster").alias("_nmin"))
        )
        updated = (
            labels.join(neigh, labels.id == neigh.dst, "left")
            .select(
                "id",
                F.least(
                    F.col("cluster"), F.coalesce(F.col("_nmin"), F.col("cluster"))
                ).alias("cluster"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "id")
            .filter(F.col("u.cluster") != F.col("l.cluster"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    edges.unpersist()
    if changed > 0:
        # a cap must never silently truncate: a component with diameter >
        # max_iter is otherwise split into several clusters and downstream
        # keep/drop decisions retain duplicates
        _log.warning(
            "dedup_clusters did NOT converge in %d rounds (%d labels still "
            "changing) — raise max_iter; components wider than max_iter are "
            "split and duplicates will survive the keep/drop pass",
            max_iter, changed,
        )
    return labels.select("id", "cluster")


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
    hashes_df: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard over n-gram shingle sets for (id_a, id_b) candidate
    pairs (the verify stage after minhash/simhash candidate generation).

    ``hashes_df``: precomputed (id, sh: array<long>) hashed-shingle table
    (``hashed_shingle_table``, persisted) — the intersect/union then runs
    over 8-byte longs instead of strings (exact up to a negligible
    in-pair hash-collision probability, and several times cheaper).
    ``shingles_df``: the older string variant (``shingle_table``)."""
    # both pair sides join against the shingle table — persist so the
    # shingling pipeline runs once
    if hashes_df is not None:
        sh = hashes_df
    elif shingles_df is not None:
        sh = shingles_df
    else:
        sh = hashed_shingle_table(
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
