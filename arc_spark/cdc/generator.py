"""Deterministic synthetic binlog / WAL change-event stream.

Shape follows FIXTURES.md §2 (which mirrors BASELINE.json input_hint):

    seq long, op string{insert,update,delete,schema-change},
    repo string, path string, commit string,
    lang string (nullable; populated only after the schema-change cutover),
    content string (null for delete/schema-change), ts timestamp

Scale-first design: the stream is a pure function of (seed, n_events)
expressed entirely in JVM-side column expressions over ``spark.range`` —
no driver loop, no Python UDF, no collected state. ``spark.range`` splits
the [0, n) interval across executors, so generating 10^10 events is
embarrassingly parallel and each partition is deterministic regardless of
parallelism (every value derives from ``seq`` alone).

Skew: repo ids follow a discrete power-law (repo 0 is the hottest) so the
apply kernel's skew handling (two-phase salted aggregation) is genuinely
exercised, per the reference's absence of any skew handling (SURVEY.md §4)
which we must improve on.

Reference parity: the rate/load-generation role of this module corresponds
to the reference's RateExtract (``extract/RateExtract.scala:97-119``); the
deterministic-fixture role corresponds to its KnownData test fixture
(``src/test/scala/ai/tripl/arc/util/TestUtils.scala:26-37``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "scala", "java", "ts", "go", "rs", "md"]

# Op mix per FIXTURES.md §2: ~60% update / 25% insert / 14% delete / 1% schema-change.
_OP_UPDATE_HI = 0.60
_OP_INSERT_HI = 0.85
_OP_DELETE_HI = 0.99

EPOCH0 = "2024-01-01 00:00:00"


def _u(col, salt: int, seed: int):
    """Deterministic uniform [0,1) derived from a long column via xxhash64."""
    h = F.xxhash64(col, F.lit(salt), F.lit(seed))
    # map signed 64-bit to [0,1)
    return (h.cast("double") / F.lit(2.0**64)) + F.lit(0.5)


def change_stream(
    spark: SparkSession,
    n_events: int,
    *,
    seed: int = 42,
    n_repos: int = 200,
    paths_per_repo: int = 500,
    skew: float = 3.0,
    schema_change_at: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the deterministic change stream as a lazy DataFrame.

    ``schema_change_at``: seq at which a single ``schema-change`` event adds
    the ``lang`` column; events after it carry ``lang``, events before have
    it null. ``None`` → lang populated throughout, no schema-change events.
    """
    df = (
        spark.range(0, n_events, 1, num_partitions)
        if num_partitions
        else spark.range(n_events)
    )
    seq = F.col("id")

    # Power-law repo id: floor(N * u^skew) concentrates mass near 0
    # (P(repo 0) = N^(-1/skew); skew=3, N=200 → ~17% of all events hit one
    # repo — a genuinely hot key that exercises salting / partial-agg).
    u_repo = _u(seq, 1, seed)
    repo_id = F.floor(F.lit(float(n_repos)) * F.pow(u_repo, F.lit(skew))).cast("long")
    repo = F.concat(F.lit("org"), (repo_id % 17).cast("string"), F.lit("/repo"), repo_id.cast("string"))

    path_id = F.pmod(F.xxhash64(seq, F.lit(2), F.lit(seed)), F.lit(paths_per_repo))
    path = F.concat(
        F.lit("src/"),
        (path_id % 13).cast("string"),
        F.lit("/"),
        (path_id % 7).cast("string"),
        F.lit("/file"),
        path_id.cast("string"),
        F.lit(".txt"),
    )

    u_op = _u(seq, 3, seed)
    op = (
        F.when(u_op < _OP_UPDATE_HI, F.lit("update"))
        .when(u_op < _OP_INSERT_HI, F.lit("insert"))
        .when(u_op < _OP_DELETE_HI, F.lit("delete"))
        .otherwise(F.lit("schema-change"))
    )
    if schema_change_at is not None:
        # exactly one schema-change event, at a known seq.
        op = F.when(seq == schema_change_at, F.lit("schema-change")).otherwise(
            F.when(u_op < _OP_UPDATE_HI, F.lit("update"))
            .when(u_op < _OP_INSERT_HI, F.lit("insert"))
            .otherwise(F.lit("delete"))
        )

    commit = F.substring(F.sha2(F.concat(seq.cast("string"), F.lit(f"c{seed}")), 256), 1, 40)

    lang_arr = F.array(*[F.lit(x) for x in LANGS])
    lang = F.element_at(lang_arr, (F.pmod(F.xxhash64(seq, F.lit(4), F.lit(seed)), F.lit(len(LANGS))) + 1).cast("int"))
    if schema_change_at is not None:
        lang = F.when(seq > schema_change_at, lang)  # null before cutover

    # Deterministic pseudo source text, 50-5000 chars: a header line plus a
    # sha2-derived body repeated a hash-dependent number of times. Includes
    # trailing whitespace so content normalization has work to do.
    body = F.sha2(F.concat(seq.cast("string"), F.lit(f"b{seed}")), 512)
    reps = (F.pmod(F.xxhash64(seq, F.lit(5), F.lit(seed)), F.lit(38)) + 1).cast("int")
    content = F.concat(
        F.lit("// "),
        repo,
        F.lit(":"),
        path,
        F.lit("@"),
        commit,
        F.lit("  \n"),
        F.repeat(F.concat(body, F.lit("   \n")), reps),
    )

    is_row_op = F.col("op").isin("insert", "update")
    out = df.select(
        seq.alias("seq"),
        op.alias("op"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
        (F.lit(EPOCH0).cast("timestamp") + F.make_interval(secs=seq.cast("double") / 1000.0)).alias("ts"),
    )
    return out.withColumn("path", F.when(F.col("op") == "schema-change", F.lit(None)).otherwise(F.col("path"))).withColumn(
        "content", F.when(is_row_op, F.col("content"))
    )


def write_change_stream(
    spark: SparkSession,
    out_dir: str,
    n_events: int,
    *,
    seed: int = 42,
    num_partitions: int = 32,
    **kwargs,
) -> str:
    """Materialize the stream as parquet ordered/partitioned by seq range so
    micro-batch reads (``seq BETWEEN a AND b``) prune via min/max stats."""
    df = change_stream(spark, n_events, seed=seed, num_partitions=num_partitions, **kwargs)
    # range-partition on seq → each file covers a contiguous seq band →
    # parquet row-group min/max stats make per-epoch scans near-zero-IO.
    df.repartitionByRange(num_partitions, "seq").write.mode("overwrite").parquet(out_dir)
    return out_dir
