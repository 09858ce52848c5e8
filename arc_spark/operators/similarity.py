"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products via ``F.zip_with`` + ``F.aggregate`` (JVM-side, codegen);
  top-k per query via window-free ``ORDER BY LIMIT k`` for a single query
  or a groupBy-max_by pattern for query batches.
- ``lsh_topk``: random-hyperplane LSH bucketing — the scale path. Signs of
  ``h`` fixed random hyperplane projections form a bucket key; candidates
  share ≥1 banded sub-key; exact cosine re-rank inside buckets. The
  hyperplanes are deterministic (seeded) literal arrays broadcast in the
  plan — no driver-side model state.
- ``embedding_near_dup``: all pairs with cosine ≥ threshold via the same
  LSH bucketing (used as the embedding near-dup dedup operator).

Scale rationale: brute force is O(n) per query and fine for small query
sets even at 10^9 rows (one scan, partial top-k per partition then merge —
Spark's ORDER BY LIMIT does exactly this with TakeOrderedAndProject).
The LSH variant bounds candidate sets so multi-query / all-pairs work
avoids the O(n·q) blowup.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k rows by cosine similarity to ``query_vec``.

    The plan is scan → project(score) → TakeOrderedAndProject(k): each
    partition keeps its local top-k, the driver merges P·k rows — no full
    sort, no shuffle of the data.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cosine_sim"),
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col)).limit(k)


def _hyperplanes(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    rnd = random.Random(seed)
    return [
        [rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)
    ]


def lsh_bucket_expr(vec: Column, planes: list[list[float]], band: int, rows_per_band: int) -> Column:
    bits = []
    for r in range(rows_per_band):
        p = planes[band * rows_per_band + r]
        proj = _dot(vec, F.array(*[F.lit(x) for x in p]))
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**r))
    key = bits[0]
    for b in bits[1:]:
        key = key + b
    return key


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: only rows sharing ≥1 LSH band bucket with the
    query are scored. Deterministic given ``seed``."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, num_planes, seed)
    rpb = num_planes // bands
    v = F.col(vec_col).cast("array<double>")

    import numpy as np

    qarr = np.array(query_vec, dtype=float)
    q_keys = []
    for band in range(bands):
        key = 0
        for r in range(rpb):
            p = np.array(planes[band * rpb + r])
            if float(qarr @ p) >= 0:
                key += 2**r
        q_keys.append(key)

    cand = None
    for band in range(bands):
        m = lsh_bucket_expr(v, planes, band, rpb) == F.lit(q_keys[band])
        cand = m if cand is None else (cand | m)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.filter(cand)
        .select(F.col(id_col), cosine(v, q).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


class IVFIndex:
    """IVF (inverted-file) ANN index: a KMeans coarse quantizer assigns
    every vector to its nearest centroid; a query probes only the
    ``nprobe`` nearest clusters and brute-forces inside them.

    Scale rationale: the index is a plain DataFrame partitioned/clustered
    by ``_cluster`` — written as parquet partitioned on it, a query scans
    only nprobe/k of the data (partition pruning), and the KMeans fit is
    Spark MLlib's distributed Lloyd's (no driver-side vocabulary/index
    build beyond k centroid vectors).
    """

    def __init__(self, model, assigned: DataFrame, vec_col: str, id_col: str):
        self.model = model
        self.assigned = assigned
        self.vec_col = vec_col
        self.id_col = id_col

    @classmethod
    def build(
        cls,
        df: DataFrame,
        *,
        k: int = 16,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        seed: int = 42,
        max_iter: int = 20,
    ) -> "IVFIndex":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feat = df.withColumn("_features", array_to_vector(F.col(vec_col).cast("array<double>")))
        model = KMeans(k=k, seed=seed, maxIter=max_iter, featuresCol="_features").fit(feat)
        assigned = (
            model.transform(feat)
            .withColumnRenamed("prediction", "_cluster")
            .drop("_features")
        )
        return cls(model, assigned, vec_col, id_col)

    def topk(self, query_vec: list[float], k: int = 10, *, nprobe: int = 4) -> DataFrame:
        import numpy as np

        centers = self.model.clusterCenters()
        q = np.array(query_vec, dtype=float)
        dists = [float(np.linalg.norm(q - c)) for c in centers]
        probe = sorted(range(len(centers)), key=lambda i: dists[i])[:nprobe]
        cand = self.assigned.filter(F.col("_cluster").isin(probe))
        qcol = F.array(*[F.lit(float(x)) for x in query_vec])
        return (
            cand.select(
                F.col(self.id_col),
                cosine(F.col(self.vec_col).cast("array<double>"), qcol).alias("cosine_sim"),
            )
            .orderBy(F.col("cosine_sim").desc(), F.col(self.id_col))
            .limit(k)
        )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """One-shot IVF query (build + probe). For repeated queries build an
    IVFIndex once and call ``topk``."""
    index = IVFIndex.build(df, k=n_clusters, vec_col=vec_col, id_col=id_col, seed=seed)
    return index.topk(query_vec, k, nprobe=nprobe)


def embedding_near_dup(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """All pairs with cosine ≥ threshold, via banded hyperplane-LSH
    bucketing + exact re-rank (id_a < id_b)."""
    sample = df.select(vec_col).first()
    dim = len(sample[0])
    planes = _hyperplanes(dim, num_planes, seed)
    rpb = num_planes // bands
    v = F.col(vec_col).cast("array<double>")
    base = df.select(F.col(id_col).alias("id"), v.alias("v"))
    banded = base.select(
        "id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        lsh_bucket_expr(F.col("v"), planes, band, rpb).alias("bucket"),
                    )
                    for band in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "v", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
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
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.withColumn("cosine_sim", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
