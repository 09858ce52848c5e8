"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``   — flagship: CDC last-writer-wins replay over the
                     sf0.001 events table (normalize + Arrow sha256
                     fingerprint + window LWW kernel).
``queries()``      — one entry per implemented operator (SURVEY.md §2 and
                     the training-data operator family).
``oracle_sql()``   — DuckDB-equivalent ANSI SQL for every SQL-expressible
                     query.

Determinism notes (so Spark and DuckDB value-hashes match):
- Sums/avgs of double money columns are computed as SUM(CAST(x AS
  DECIMAL(18,4))) — exact decimal arithmetic in both engines — then cast
  back to double. Plain double SUM is order-dependent and won't hash-match.
- Similarity queries return integer ranks (order by exact score), never
  float scores, to dodge last-ULP engine differences.
- Raw column values (doubles included) pass through untouched — identical
  bits in parquet → identical hashes.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


# Resolved-relation cache: repeated `spark.read.parquet` on the same path
# re-lists the directory and re-reads footers for schema inference on the
# DRIVER every call (~80 ms/table here; minutes for a large partitioned
# table) — exactly the metadata a catalog would hold. Reusing the resolved
# DataFrame is metadata caching only: the plan is lazy and every action
# still scans the parquet input (guide §6 "file listing").
_RELATION_CACHE: dict[tuple[str, str], DataFrame] = {}


def _load(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    out = {}
    app = spark.sparkContext.applicationId
    # entries of stopped applications hold DataFrames over dead contexts
    # — evict anything not keyed by the live app so the cache stays O(a
    # few tables) for the process lifetime
    for k in [k for k in _RELATION_CACHE if k[0] != app]:
        del _RELATION_CACHE[k]
    for n in names:
        key = (app, os.path.join(sf_dir, f"{n}.parquet"))
        df = _RELATION_CACHE.get(key)
        if df is None:
            df = spark.read.parquet(key[1])
            _RELATION_CACHE[key] = df
        df.createOrReplaceTempView(n)
        out[n] = df
    return out


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """CDC LWW replay of the sf0.001 events table: binlog-style mapping
    (seq=event_id, key=user_id, delete on 'error'), Arrow-vectorized
    normalize+sha256 on the payload, window last-writer-wins kernel —
    WindowGroupLimit partial top-1 per key map-side, spillable sort
    instead of fat hash-agg state; measured-best default (see
    cdc/apply.py for the strategy A/B)."""
    return _cdc_lww(spark, "/root/testdata/sf0.001")


def _cdc_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from arc_spark.cdc.apply import last_writer_wins, normalize_and_fingerprint

    events = _load(spark, sf_dir, "events")["events"]
    changes = events.select(
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("props").alias("content"),
    )
    # fingerprint AFTER dedup (the runner's rule, cdc/runner.py): the
    # Arrow kernel touches only surviving winners, not the whole stream
    winners = last_writer_wins(changes, ["user_id"], "seq", strategy="window")
    winners = normalize_and_fingerprint(winners)
    return winners.filter(F.col("op") != "delete").select(
        "user_id",
        F.col("seq").alias("last_seq"),
        "event_type",
        "value",
        F.col("content").alias("props"),
        "content_sha256",
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    li = _load(spark, sf_dir, "lineitem")["lineitem"]
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    one = F.lit(1).cast("decimal(18,4)")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (one - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                dec("l_extendedprice") * (one - dec("l_discount")) * (one + dec("l_tax"))
            )
            .cast("double")
            .alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(dec("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q3_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    t = _load(spark, sf_dir, "customer", "orders", "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    one = F.lit(1).cast("decimal(18,4)")
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < "1995-03-15")
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > "1995-03-15")
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def _q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    t = _load(
        spark, sf_dir, "region", "nation", "customer", "orders", "lineitem", "supplier"
    )
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    one = F.lit(1).cast("decimal(18,4)")
    return (
        t["region"]
        .join(t["nation"], F.col("n_regionkey") == F.col("r_regionkey"))
        .join(t["customer"], F.col("c_nationkey") == F.col("n_nationkey"))
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def _top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    t = _load(spark, sf_dir, "customer", "orders")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn")
    )


def _events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = _load(spark, sf_dir, "events")["events"]
    return (
        ev.groupBy(
            F.col("event_type"), F.date_trunc("hour", F.col("ts")).alias("hour")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
    )


def _events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = _load(spark, sf_dir, "events")["events"]
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    # parse the JSON ONCE per row: referencing `k` in both the group key
    # and the max() re-evaluated get_json_object twice per row (CollapseProject
    # keeps the two projections apart for non-cheap exprs, so the explicit
    # select halves the per-row parse work; same rows, same schema)
    return (
        ev.select("event_type", k.alias("_k"))
        .withColumn("k_bucket", F.col("_k") % 10)
        .groupBy("event_type", "k_bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.max("_k").alias("max_k"))
    )


def _lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    li = _load(spark, sf_dir, "lineitem")["lineitem"]

    def profile(col: str) -> DataFrame:
        d = F.col(col)
        return li.agg(
            F.lit(col).alias("col_name"),
            F.count(d).alias("cnt"),
            F.count_distinct(d).alias("distinct_cnt"),
            F.count_if(d.isNull()).alias("null_cnt"),
            F.min(d).cast("double").alias("min_val"),
            F.max(d).cast("double").alias("max_val"),
            (F.sum(d.cast("decimal(18,4)")).cast("double") / F.count(d)).alias("mean_val"),
        )

    return profile("l_quantity").unionAll(profile("l_extendedprice"))


def _dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arc_spark.operators.dedup import dedup_exact

    docs = _load(spark, sf_dir, "documents")["documents"]
    return dedup_exact(docs, "text", "doc_id").select("doc_id", "lang", "source", "n_chars")


def _doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from arc_spark.operators.text import token_count

    docs = _load(spark, sf_dir, "documents")["documents"]
    c = F.col("text")
    return docs.select(
        "doc_id",
        token_count(c).alias("n_tokens"),
        F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", "")).alias("n_punct"),
        F.length(F.regexp_replace(c, r"[^0-9]", "")).alias("n_digit"),
        F.length(F.regexp_replace(c, r"[^A-Z]", "")).alias("n_upper"),
        F.length(c).alias("n_chars_calc"),
    )


def _lang_quality_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = _load(spark, sf_dir, "documents")["documents"]
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("source").alias("n_sources"),
        (F.sum(F.col("n_chars").cast("decimal(18,4)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_chars"
        ),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def _knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from arc_spark.operators.similarity import cosine_topk

    emb = _load(spark, sf_dir, "embeddings")["embeddings"]
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    topk = cosine_topk(emb.filter(F.col("vec_id") != 0), list(qvec), k=10)
    return topk.select(
        F.row_number()
        .over(Window.orderBy(F.col("cosine_sim").desc(), F.col("vec_id")))
        .alias("rank"),
        "vec_id",
    )


def _events_as_changes(
    spark: SparkSession, sf_dir: str, *, with_commit: bool = False
) -> DataFrame:
    """The shared events→change-stream mapping every CDC query (and its
    DuckDB oracle) uses: seq=event_id, delete on event_type='error',
    key=(org<user_id%7>, f<user_id>/<event_id%3>), payload=(value,
    props-as-content). ``with_commit`` adds the 40-hex commit id
    (sha2(event_id)[:40]) the full-replay queries carry. Defined ONCE so
    the Spark side can't drift from the oracles' copy of the same
    arithmetic."""
    from pyspark.sql import functions as F

    ev = _load(spark, sf_dir, "events")["events"]
    cols = [
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("op"),
        F.concat(F.lit("org"), (F.col("user_id") % 7).cast("string")).alias("repo"),
        F.concat(
            F.lit("f"),
            F.col("user_id").cast("string"),
            F.lit("/"),
            (F.col("event_id") % 3).cast("string"),
        ).alias("path"),
    ]
    if with_commit:
        cols.append(
            F.substring(
                F.sha2(F.col("event_id").cast("string"), 256), 1, 40
            ).alias("commit")
        )
    return ev.select(*cols, F.col("value"), F.col("props").alias("content"))


def _cdc_lww_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    df = _cdc_lww(spark, sf_dir)
    # drop the sha256 column for the oracle-checked variant? no — DuckDB
    # has sha256(); keep it and let the oracle compute the same digest of
    # the identically-normalized props string.
    return df


def _cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 over the same synthetic change interpretation as
    cdc_lww_events: full version history with [valid_from_seq,
    valid_to_seq) intervals; deletes (event_type='error') close their
    predecessor and emit no row (arc_spark/cdc/apply.py apply_scd2 —
    one lead() window = one shuffle by key; history output ≈ input rows,
    so late materialization cannot beat this plan)."""
    from pyspark.sql import functions as F

    from arc_spark.cdc.apply import apply_scd2

    events = _load(spark, sf_dir, "events")["events"]
    changes = events.select(
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
    )
    hist = apply_scd2(changes, ["user_id"], "seq")
    return hist.select(
        "user_id",
        "valid_from_seq",
        "valid_to_seq",
        "is_current",
        "event_type",
        "value",
    )


def _cdc_debezium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium wire-format round trip: events serialized as Debezium
    change-event envelopes (before/after/op/source.lsn JSON — the binlog
    connector wire format), parsed back through the pure-codegen envelope
    adapter (arc_spark/cdc/debezium.py), LWW-applied. Final state must
    equal a plain arg_max LWW over the source rows — proving the
    serialize→parse→apply path loses nothing (op side selection, delete
    from `before`, seq from source.lsn, double/string JSON round trip)."""
    from pyspark.sql import functions as F

    from arc_spark.cdc.apply import last_writer_wins
    from arc_spark.cdc.debezium import parse_debezium

    ev = _load(spark, sf_dir, "events")["events"]
    payload = F.struct(
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    )
    is_del = F.col("event_type") == "error"
    raw = ev.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.when(is_del, payload).alias("before"),
                    F.when(~is_del, payload).alias("after"),
                    F.when(is_del, F.lit("d")).otherwise(F.lit("u")).alias("op"),
                    (F.col("event_id") * 1000).alias("ts_ms"),
                    F.struct(
                        F.col("event_id").cast("long").alias("lsn"),
                        F.lit(None).cast("long").alias("pos"),
                    ).alias("source"),
                ).alias("payload")
            )
        ).alias("value")
    )
    # persist the parsed frame: the thin-LWW winner pass and the fat
    # join-back would otherwise each re-run the to_json -> from_json
    # envelope chain over the whole stream (the dominant CPU here)
    parsed = parse_debezium(
        raw, "user_id bigint, event_type string, value double, props string"
    ).drop("_ts_ms").persist()
    winners = last_writer_wins(parsed, ["user_id"], "seq", strategy="thin")
    return winners.filter(F.col("op") != "delete").select(
        "user_id",
        F.col("seq").alias("last_seq"),
        "event_type",
        "value",
        "props",
    )


def _cdc_tx_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transaction-boundary gating (arc_spark/cdc/debezium.py
    tx_safe_horizon): events serialized as Debezium envelopes WITH
    per-event transaction blocks; the metadata topic is cut at the same
    crash point as the event tail, so END records exist only for
    transactions fully committed before the cut. The gate must hold back
    (a) the partial trailing transaction and (b) everything above the
    atomicity-closure cut forced by a COMPLETE transaction interleaved
    across the initial horizon — each 64-seq block's tail 16 events are
    split into two interleaved transactions (txA spans m 48-57, txB
    54-63) and the cut lands at m=60, planting exactly one crosser.
    Final state = LWW over events at or below the horizon. The DuckDB
    oracle computes the horizon in CLOSED FORM: max h such that no
    transaction spans h and no incomplete transaction starts at or
    below h — provably the fixpoint of the engine's downward iteration
    (each jump lands on a crosser's first_seq - 1 and the skipped
    interval is entirely spanned by that crosser, so no h between two
    iterates satisfies the predicate)."""
    from pyspark.sql import functions as F

    from arc_spark.cdc.apply import last_writer_wins
    from arc_spark.cdc.debezium import (
        parse_debezium,
        parse_tx_metadata,
        tx_safe_horizon,
    )

    ev = _load(spark, sf_dir, "events")["events"]
    seq = F.col("event_id").cast("long")
    m = seq % 64
    blk = F.expr("event_id DIV 64").cast("string")
    tx = (
        F.when(
            m < 48,
            F.concat(
                F.lit("c"), blk, F.lit("_"),
                F.expr("(event_id % 64) DIV 8").cast("string"),
            ),
        )
        .when((m <= 53) | m.isin(55, 57), F.concat(F.lit("a"), blk))
        .otherwise(F.concat(F.lit("b"), blk))
    )
    max_seq = int(ev.agg(F.max("event_id")).first()[0])
    cutoff = (max_seq // 64 - 1) * 64 + 60  # crash point: mid-txB, above txA's end

    payload = F.struct(
        F.col("user_id"), F.col("event_type"), F.col("value"), F.col("props")
    )
    is_del = F.col("event_type") == "error"
    raw = (
        ev.filter(seq <= cutoff)  # the connector died here: both topics stop
        .select(
            F.to_json(
                F.struct(
                    F.struct(
                        F.when(is_del, payload).alias("before"),
                        F.when(~is_del, payload).alias("after"),
                        F.when(is_del, F.lit("d")).otherwise(F.lit("u")).alias("op"),
                        (seq * 1000).alias("ts_ms"),
                        F.struct(
                            seq.alias("lsn"), F.lit(None).cast("long").alias("pos")
                        ).alias("source"),
                        F.struct(
                            tx.alias("id"),
                            F.lit(None).cast("long").alias("total_order"),
                            F.lit(None).cast("long").alias("data_collection_order"),
                        ).alias("transaction"),
                    ).alias("payload")
                )
            ).alias("value")
        )
    )
    # metadata topic: the connector emits END right after a tx's last
    # event, so an END survives the crash iff last_seq <= cutoff
    meta_raw = (
        ev.select(seq.alias("seq"), tx.alias("tx_id"))
        .groupBy("tx_id")
        .agg(F.max("seq").alias("last_seq"), F.count("*").alias("n"))
        .filter(F.col("last_seq") <= cutoff)
        .select(
            F.to_json(
                F.struct(
                    F.lit("END").alias("status"),
                    F.col("tx_id").alias("id"),
                    F.col("n").alias("event_count"),
                    (F.col("last_seq") * 1000).alias("ts_ms"),
                )
            ).alias("value")
        )
    )
    # persist the parsed frame: the horizon's per-tx aggregate, the LWW
    # winner pass and the fat join-back would otherwise each re-run the
    # to_json -> from_json envelope chain over the whole stream
    parsed = parse_debezium(
        raw,
        "user_id bigint, event_type string, value double, props string",
        with_tx=True,
    ).drop("_ts_ms").persist()
    horizon = tx_safe_horizon(
        parsed.select("_tx_id", "seq"), parse_tx_metadata(meta_raw)
    )
    applied = parsed.drop("_tx_id", "_tx_order")
    if horizon is not None:
        applied = applied.filter(F.col("seq") <= horizon)
    winners = last_writer_wins(applied, ["user_id"], "seq", strategy="thin")
    return winners.filter(F.col("op") != "delete").select(
        "user_id",
        F.col("seq").alias("last_seq"),
        "event_type",
        "value",
        "props",
    )


def _diff_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DiffTransform analogue: left-only rows between two projections of
    orders (reference: transform/DiffTransform.scala:116-171)."""
    from pyspark.sql import functions as F

    from arc_spark.operators.diff import diff_views

    t = _load(spark, sf_dir, "orders")
    left = t["orders"].filter(F.col("o_totalprice") > 50000).select(
        "o_orderkey", "o_orderstatus"
    )
    right = t["orders"].filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_orderstatus"
    )
    res = diff_views(left, right)
    return res["left_only"]


def _minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH candidates + exact n-gram-Jaccard verify. The verify
    stage makes the output oracle-checkable: it equals the brute-force
    exact-Jaccard pair set whenever LSH recall is 1. 32 hashes / 16 bands
    (2 rows per band) misses a ≥0.8-Jaccard pair with prob
    (1-J²)¹⁶ ≤ (1-0.64)¹⁶ ≈ 8.7e-8 — recall 1 for the planted duplicates
    in this corpus (clean gap: nothing in [0.4, 0.8)), verified
    pair-set-equal to the 1-row-per-band config at sf0.001/0.01/0.1 —
    while 2-row bands collapse spurious candidates ~75x (157,774 → 2,096
    at sf0.1; r03's 1-row bands put every pair sharing ANY single
    minhash value in a bucket)."""
    from arc_spark.operators.dedup import (
        hashed_shingle_table,
        minhash_near_dup,
        ngram_jaccard_pairs,
    )

    docs = _load(spark, sf_dir, "documents")["documents"]
    # ONE shingle+hash pass shared by candidate generation and exact
    # verify; Jaccard runs over hashed (long) shingles, never strings
    ht = hashed_shingle_table(docs, "text", "doc_id", shingle_n=3).persist()
    cand = minhash_near_dup(
        docs, "text", "doc_id", num_hashes=32, bands=16, jaccard_threshold=0.0,
        hashes_df=ht, max_bucket_size=None,  # provable-recall oracle config
    )
    return ngram_jaccard_pairs(
        docs, cand.select("id_a", "id_b"), "text", "doc_id",
        shingle_n=3, threshold=0.4, hashes_df=ht,
    )


def _simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash candidates + exact verify. bands=16 > max_hamming=15 means
    the banded join provably contains EVERY pair within Hamming 15
    (pigeonhole: 15 differing bits cannot touch all 16 4-bit chunks) — and
    all exact-Jaccard-≥0.7 pairs in this corpus sit at Hamming ≤ 13, so
    the verified output equals the brute-force pair set."""
    from arc_spark.operators.dedup import ngram_jaccard_pairs, simhash_near_dup

    docs = _load(spark, sf_dir, "documents")["documents"]
    cand = simhash_near_dup(
        docs, "text", "doc_id", max_hamming=15, bands=16,
        max_bucket_size=None,  # provable-recall oracle config
    )
    return ngram_jaccard_pairs(
        docs, cand.select("id_a", "id_b"), "text", "doc_id", shingle_n=3, threshold=0.7
    )


def _embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH near-dup pairs, exact-cosine verified. 32 planes /
    16 bands: every cosine-≥0.5 pair in the test corpus collides in ≥3
    bands (verified offline at all SFs), so the output equals brute force.
    Only integer id pairs are returned — float scores differ in the last
    ULP across engines."""
    from arc_spark.operators.similarity import embedding_near_dup

    emb = _load(spark, sf_dir, "embeddings")["embeddings"]
    # max_bucket_size=None: the oracle config must provably never drop a
    # candidate (the production default cap is exercised in pytest)
    return embedding_near_dup(
        emb, threshold=0.5, num_planes=32, bands=16, max_bucket_size=None
    ).select("id_a", "id_b")


def _statistics_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile kernel in exact mode, projected to the
    deterministic stats (count / exact distinct / nulls / decimal-exact
    mean / min / max / length stats). stddev and approx percentiles are
    excluded from the oracle check — their floating summation order is
    engine-specific."""
    from arc_spark.operators.statistics import statistics

    li = _load(spark, sf_dir, "lineitem")["lineitem"]
    # stddev/percentiles are NOT in the projection below, but the kernel's
    # eager one-row agg computes everything requested — exact percentiles
    # buffer the whole column 3x per numeric field (measured 100 s at
    # sf0.1 for stats this query then dropped), so opt out explicitly
    return statistics(
        li, approximate=False, percentiles=False, stddev=False
    ).select(
        "col_name", "data_type", "count", "distinct_count", "null_count",
        "mean", "min", "max", "minlen", "avglen", "maxlen",
    )


def _rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    t = _load(spark, sf_dir, "orders")
    return (
        t["orders"]
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("sum_price"),
        )
    )


def _customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    t = _load(spark, sf_dir, "customer", "orders")
    return t["customer"].join(
        t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def _top_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape (q2-like): suppliers holding their
    nation's max account balance."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    t = _load(spark, sf_dir, "supplier", "nation")
    w = Window.partitionBy("s_nationkey")
    return (
        t["supplier"]
        .withColumn("max_bal", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("max_bal"))
        .join(t["nation"], F.col("n_nationkey") == F.col("s_nationkey"))
        .select("n_name", "s_suppkey", "s_name", "s_acctbal")
    )


def _user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per-user session count with a 30-minute gap rule
    (lag window + conditional sum)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = _load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # sub-second-exact gap: timestamp subtraction yields an exact
    # microsecond interval in both engines — unix_timestamp() truncates to
    # seconds and can classify a boundary gap differently from the oracle
    gap = F.col("ts") - F.lag("ts").over(w)
    return (
        ev.withColumn(
            "new_sess", F.when(gap > F.expr("INTERVAL '1800' SECOND"), 1).otherwise(0)
        )
        .groupBy("user_id")
        .agg(
            (F.sum("new_sess") + 1).cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def _part_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    t = _load(spark, sf_dir, "part")
    p = t["part"]
    return p.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.substring(F.col("p_type"), 1, 5).alias("type_prefix"),
        F.length(F.col("p_name")).alias("name_len"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "").alias("name_novowel"),
        F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
    )


def _shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (TPC-H q12 shape): per return flag, how many
    high- vs low-priority order line items shipped."""
    from pyspark.sql import functions as F

    t = _load(spark, sf_dir, "orders", "lineitem")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") >= "1995-01-01")
        .groupBy("l_returnflag")
        .agg(
            F.count_if(hi).alias("high_line_count"),
            F.count_if(~hi).alias("low_line_count"),
        )
    )


def _promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-sum ratio (TPC-H q14 shape): revenue share of PROMO
    parts, decimal-exact then one final double division."""
    from pyspark.sql import functions as F

    t = _load(spark, sf_dir, "part", "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    one = F.lit(1).cast("decimal(18,4)")
    rev = dec("l_extendedprice") * (one - dec("l_discount"))
    j = t["lineitem"].join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
    # rounded to 12 decimals: DECIMAL(38,8)->DOUBLE conversion can differ by
    # 1 ULP between engines (two-step int128 scaling vs single rounding)
    return j.agg(
        F.round(
            F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0)).cast("decimal(38,8)")).cast("double")
            / F.sum(rev.cast("decimal(38,8)")).cast("double"),
            12,
        ).alias("promo_share"),
        F.count(F.lit(1)).alias("n_items"),
    )


def _cdc_replay_mini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-ENGINE oracle check: the events table is mapped to a binlog
    stream (key = (repo,path) derived from user_id/event_id, delete on
    'error'), written range-partitioned on seq, replayed through the real
    micro-batch ReplayRunner (multiple epochs, manifests, tombstones,
    COW merge) into a lake table — and the final state must hash-match a
    plain DuckDB arg_max-LWW over the same derivation."""
    import tempfile

    from pyspark.sql import functions as F

    from arc_spark.cdc.bootstrap import create_table_for_stream
    from arc_spark.cdc.runner import ReplayRunner

    ev = _load(spark, sf_dir, "events")["events"]
    changes = _events_as_changes(spark, sf_dir, with_commit=True)
    d = tempfile.mkdtemp(prefix="cdcmini_")
    changes.repartitionByRange(8, "seq").write.mode("overwrite").parquet(f"{d}/ev")
    table, _ = create_table_for_stream(spark, f"{d}/ev", f"{d}/lake", num_buckets=16)
    max_seq = ev.agg(F.max("event_id")).first()[0]
    ReplayRunner(spark, f"{d}/ev", table, batch_size=max(1, int(max_seq) // 4 + 1)).run()
    return table.read(spark).select(
        "repo", "path", "seq", "commit", "value", "content_sha256"
    )


def _iceberg_round_trip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg interop certified end-to-end: the same binlog derivation as
    cdc_replay_mini is replayed (COW) into a lake table, exported as
    spec-compliant Iceberg v2 metadata (arc_spark/lake/iceberg_export.py)
    and read BACK through the independent Iceberg spec reader
    (arc_spark/lake/iceberg_read.py: metadata chain -> manifest-list ->
    manifests -> live-file scan, equality deletes by sequence number) —
    NOT through the lake's own read path. The result must hash-match the
    plain LWW oracle, so any spec drift in either the writer or the
    reader (sequence numbers, delete scope, name mapping, schema types)
    diverges."""
    return _iceberg_round_trip_mode(spark, sf_dir, "cow")


def _iceberg_round_trip_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MOR shape of the Iceberg loop: the replay commits merge-on-read
    delta epochs and the export runs WITHOUT compaction — outstanding
    delta chains become sequence-number levels with per-level equality
    deletes (arc_spark/lake/iceberg_export.py module docstring), which
    the independent spec reader must resolve to the same LWW state the
    oracle computes. This is the per-epoch `icebergMirror` publication
    path at 100 TB (no forced compaction before publishing)."""
    return _iceberg_round_trip_mode(spark, sf_dir, "delta")


def _iceberg_landing_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The landing-zone deployment shape, oracle-gated end-to-end: the
    change stream lands in an append-only Iceberg table in three
    write_iceberg batches (true appends: earlier files carried as
    EXISTING at their sequence numbers), the replay tails THAT table
    via the spec reader (events_format='iceberg', seq-cursor resume),
    and the final lake state must hash-match the plain LWW oracle —
    certifying writer, reader, and tail in one loop
    (arc_spark/lake/iceberg_export.write_iceberg)."""
    import tempfile

    from pyspark.sql import functions as F

    from arc_spark.cdc.bootstrap import create_table_for_stream
    from arc_spark.cdc.runner import ReplayRunner
    from arc_spark.lake.iceberg_export import write_iceberg

    ev = _load(spark, sf_dir, "events")["events"]
    changes = _events_as_changes(spark, sf_dir, with_commit=True)
    d = tempfile.mkdtemp(prefix="iceland_")
    max_seq = int(ev.agg(F.max("event_id")).first()[0])
    cut1, cut2 = max_seq // 3, 2 * max_seq // 3
    for lo, hi in [(0, cut1), (cut1, cut2), (cut2, max_seq + 1)]:
        write_iceberg(
            spark,
            changes.filter((F.col("seq") >= lo) & (F.col("seq") < hi)),
            f"{d}/ice",
        )
    table, _ = create_table_for_stream(
        spark, f"{d}/ice", f"{d}/lake", num_buckets=16,
        events_format="iceberg",
    )
    ReplayRunner(
        spark, f"{d}/ice", table,
        batch_size=max(1, max_seq // 4 + 1), events_format="iceberg",
    ).run()
    return table.read(spark).select(
        "repo", "path", "seq", "commit", "value", "content_sha256"
    )


def _iceberg_compaction_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The landing-zone MAINTENANCE loop in the hash gate: the change
    stream lands in five small write_iceberg batches, the replay tails
    partway (seq cursor), compact_iceberg bin-packs the small files into
    one ``replace`` snapshot and expire_iceberg_landing reclaims the
    rewritten inputs mid-stream, then the tail resumes over the
    compacted table — the final lake state must still hash-match the
    plain LWW oracle, certifying that a rewrite+expiry changes no
    logical content under an active consumer
    (arc_spark/lake/iceberg_export.compact_iceberg /
    expire_iceberg_landing)."""
    import tempfile

    from pyspark.sql import functions as F

    from arc_spark.cdc.bootstrap import create_table_for_stream
    from arc_spark.cdc.runner import ReplayRunner
    from arc_spark.lake.iceberg_export import (
        compact_iceberg,
        expire_iceberg_landing,
        write_iceberg,
    )

    ev = _load(spark, sf_dir, "events")["events"]
    changes = _events_as_changes(spark, sf_dir, with_commit=True)
    d = tempfile.mkdtemp(prefix="icecompact_")
    max_seq = int(ev.agg(F.max("event_id")).first()[0])
    cuts = [i * (max_seq + 1) // 5 for i in range(6)]
    for lo, hi in zip(cuts, cuts[1:]):
        write_iceberg(
            spark,
            changes.filter((F.col("seq") >= lo) & (F.col("seq") < hi)),
            f"{d}/ice",
        )
    table, _ = create_table_for_stream(
        spark, f"{d}/ice", f"{d}/lake", num_buckets=16,
        events_format="iceberg",
    )
    batch = max(1, max_seq // 4 + 1)
    ReplayRunner(
        spark, f"{d}/ice", table, batch_size=batch,
        events_format="iceberg",
    ).run(max_epochs=2)
    # maintenance mid-stream: rewrite + reclaim under the live consumer
    compact_iceberg(spark, f"{d}/ice", small_file_mb=256, min_input_files=2)
    expire_iceberg_landing(spark, f"{d}/ice", keep_last=1)
    ReplayRunner(  # resume over the compacted, expired table
        spark, f"{d}/ice", table, batch_size=batch,
        events_format="iceberg",
    ).run()
    return table.read(spark).select(
        "repo", "path", "seq", "commit", "value", "content_sha256"
    )


def _iceberg_round_trip_mode(
    spark: SparkSession, sf_dir: str, merge_mode: str
) -> DataFrame:
    import tempfile

    from pyspark.sql import functions as F

    from arc_spark.cdc.bootstrap import create_table_for_stream
    from arc_spark.cdc.runner import ReplayRunner
    from arc_spark.lake.iceberg_export import export_iceberg
    from arc_spark.lake.iceberg_read import read_iceberg

    ev = _load(spark, sf_dir, "events")["events"]
    changes = _events_as_changes(spark, sf_dir, with_commit=True)
    d = tempfile.mkdtemp(prefix="icebergrt_")
    changes.repartitionByRange(8, "seq").write.mode("overwrite").parquet(f"{d}/ev")
    table, _ = create_table_for_stream(spark, f"{d}/ev", f"{d}/lake", num_buckets=16)
    max_seq = ev.agg(F.max("event_id")).first()[0]
    ReplayRunner(
        spark, f"{d}/ev", table,
        batch_size=max(1, int(max_seq) // 4 + 1), merge_mode=merge_mode,
    ).run()
    export_iceberg(spark, table)
    return read_iceberg(spark, f"{d}/lake").select(
        "repo", "path", "seq", "commit", "value", "content_sha256"
    )


def _cdc_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Initial-snapshot + tail handoff (Debezium snapshot.mode=initial):
    the source table at position ``cutoff`` (LWW winners at seq <= cutoff,
    deletes gone, one row per key) is committed via bootstrap_snapshot as
    the fenced first epoch; the runner then tails ONLY seq > cutoff from
    its normal resume rule. The final table must hash-match a plain LWW
    oracle over the WHOLE stream — any gap or double-apply at the
    handoff seam diverges (arc_spark/cdc/bootstrap.py)."""
    import tempfile

    from pyspark.sql import functions as F

    from arc_spark.cdc.apply import last_writer_wins
    from arc_spark.cdc.bootstrap import bootstrap_snapshot, create_table_for_stream
    from arc_spark.cdc.runner import ReplayRunner

    ev = _load(spark, sf_dir, "events")["events"]
    changes = _events_as_changes(spark, sf_dir, with_commit=True)
    d = tempfile.mkdtemp(prefix="cdcboot_")
    changes.repartitionByRange(8, "seq").write.mode("overwrite").parquet(f"{d}/ev")
    max_seq = int(ev.agg(F.max("event_id")).first()[0])
    cutoff = max_seq // 2
    snap_df = (
        last_writer_wins(
            changes.filter(F.col("seq") <= cutoff), ["repo", "path"], "seq"
        )
        .filter(F.col("op") != "delete")
        .drop("op")
    )
    table, _ = create_table_for_stream(spark, f"{d}/ev", f"{d}/lake", num_buckets=16)
    bootstrap_snapshot(spark, table, snap_df, cutoff)
    ReplayRunner(
        spark, f"{d}/ev", table,
        batch_size=max(1, (max_seq - cutoff) // 3 + 1),
    ).run()
    return table.read(spark).select(
        "repo", "path", "seq", "commit", "value", "content_sha256"
    )


def _cdc_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay with malformed events diverted to quarantine (on_bad=
    "quarantine"): events whose id hits %53 carry an unknown op, %59 a
    NULL path — the reference oracle REJECTS both, so the final table
    must equal an LWW over only the well-formed rows. Exercises the
    codegen bad-event predicate + idempotent per-epoch quarantine sink
    (arc_spark/cdc/runner.py)."""
    import tempfile

    from pyspark.sql import functions as F

    from arc_spark.cdc.bootstrap import create_table_for_stream
    from arc_spark.cdc.runner import ReplayRunner

    ev = _load(spark, sf_dir, "events")["events"]
    changes = ev.select(
        F.col("event_id").alias("seq"),
        F.when(F.col("event_id") % 53 == 0, F.lit("chaos"))
        .when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("op"),
        F.concat(F.lit("org"), (F.col("user_id") % 7).cast("string")).alias("repo"),
        F.when(F.col("event_id") % 59 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.lit("f"),
                F.col("user_id").cast("string"),
                F.lit("/"),
                (F.col("event_id") % 3).cast("string"),
            )
        )
        .alias("path"),
        F.col("value"),
        F.col("props").alias("content"),
    )
    d = tempfile.mkdtemp(prefix="cdcquar_")
    changes.repartitionByRange(8, "seq").write.mode("overwrite").parquet(f"{d}/ev")
    table, _ = create_table_for_stream(spark, f"{d}/ev", f"{d}/lake", num_buckets=16)
    max_seq = ev.agg(F.max("event_id")).first()[0]
    ReplayRunner(
        spark, f"{d}/ev", table,
        batch_size=max(1, int(max_seq) // 3 + 1),
        on_bad="quarantine", quarantine_path=f"{d}/quarantine",
    ).run()
    return table.read(spark).select("repo", "path", "seq", "value", "content_sha256")


def _cdc_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bad-batch undo through the REAL manifest machinery: epoch 0
    applies the first half of the stream; a corrupted second half is
    then merged, ROLLED BACK (LakeTable.rollback — new manifest version
    restoring the epoch-0 snapshot), and the corrected second half
    re-applied over the SAME seq range. The final table must hash-match
    a plain LWW oracle that never saw the corruption — if rollback
    leaked any undone row (files, tombstones, committed_epochs), the
    content hashes diverge."""
    import tempfile

    from pyspark.sql import functions as F

    from arc_spark.cdc.bootstrap import create_table_for_stream
    from arc_spark.cdc.runner import ReplayRunner

    changes = _events_as_changes(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="cdcrb_")
    changes.repartitionByRange(8, "seq").write.mode("overwrite").parquet(f"{d}/ev")
    max_seq = int(changes.agg(F.max("seq")).first()[0])
    cutoff = max_seq // 2
    table, _ = create_table_for_stream(spark, f"{d}/ev", f"{d}/lake", num_buckets=16)
    # epoch 0: good first half
    ReplayRunner(spark, f"{d}/ev", table, batch_size=cutoff + 1).run(max_epochs=1)
    v_good = table.current_version()
    # the bad interlude: second half with corrupted content
    bad = changes.filter(F.col("seq") > F.lit(cutoff)).withColumn(
        "content", F.concat(F.lit("CORRUPT "), F.coalesce(F.col("content"), F.lit("")))
    )
    bad.repartitionByRange(4, "seq").write.mode("overwrite").parquet(f"{d}/evbad")
    ReplayRunner(spark, f"{d}/evbad", table, batch_size=max_seq + 1).run()
    # undo it and re-apply the corrected events over the same seq range
    table.rollback(v_good)
    ReplayRunner(spark, f"{d}/ev", table, batch_size=max_seq + 1).run()
    return table.read(spark).select("repo", "path", "seq", "value", "content_sha256")


def _cdc_changes_since(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental consumer read through the REAL manifest machinery
    (LakeTable.changes_since — the Iceberg incremental-scan analogue):
    the stream replays in four epochs, then the table is asked for
    everything changed AFTER the second epoch's end. The result must
    equal the plain-LWW winners whose winning seq lies above the cut —
    deletes surfacing as op='delete' rows from the tombstone, upserts as
    op='upsert'. A key skipped by the epoch-based bucket pruning, a
    stale row leaked from below the cut, or a resurrected tombstone all
    diverge (arc_spark/lake/table.py changes_since)."""
    import tempfile

    from pyspark.sql import functions as F

    from arc_spark.cdc.bootstrap import create_table_for_stream
    from arc_spark.cdc.runner import ReplayRunner

    changes = _events_as_changes(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="cdcchg_")
    changes.repartitionByRange(8, "seq").write.mode("overwrite").parquet(f"{d}/ev")
    max_seq = int(changes.agg(F.max("seq")).first()[0])
    batch = max(1, max_seq // 4 + 1)
    cutoff = 2 * batch - 1  # end of epoch 1: the consumer's committed cursor
    table, _ = create_table_for_stream(spark, f"{d}/ev", f"{d}/lake", num_buckets=16)
    ReplayRunner(spark, f"{d}/ev", table, batch_size=batch).run()
    return table.changes_since(spark, cutoff).select(
        "repo",
        "path",
        "op",
        F.col("seq").alias("last_seq"),
        "value",
        "content_sha256",
    )


def _cdc_alter_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only DDL mid-replay (LakeTable.alter_schema — the Iceberg
    ALTER TABLE analogue): two epochs land, then `value` is renamed to
    `score` and a nullable `stars` column added WITHOUT moving a byte;
    the remaining epochs replay with the producer migrated to the new
    schema (column emitted as `score`, `stars` populated). The final
    read serves a MIXED layout — pre-ALTER files answering for `score`
    through the column name history and reading `stars` as NULL,
    post-ALTER files natively. Must hash-match a plain LWW oracle that
    aliases/derives the columns in SQL; a stale name mapping or a lost
    pre-rename value diverges (arc_spark/lake/table.py alter_schema)."""
    import tempfile

    from pyspark.sql import functions as F

    from arc_spark.cdc.bootstrap import create_table_for_stream
    from arc_spark.cdc.runner import ReplayRunner

    changes = _events_as_changes(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="cdcalter_")
    changes.repartitionByRange(8, "seq").write.mode("overwrite").parquet(f"{d}/ev")
    max_seq = int(changes.agg(F.max("seq")).first()[0])
    batch = max(1, max_seq // 4 + 1)
    table, _ = create_table_for_stream(spark, f"{d}/ev", f"{d}/lake", num_buckets=16)
    ReplayRunner(spark, f"{d}/ev", table, batch_size=batch).run(max_epochs=2)
    from pyspark.sql.types import IntegerType, StructField

    table.alter_schema(
        rename={"value": "score"}, add=[StructField("stars", IntegerType())]
    )
    # post-ALTER events replay with the producer migrated to the new
    # schema: the column emitted as `score`, `stars` populated
    changes.withColumnRenamed("value", "score").withColumn(
        "stars", (F.col("seq") % 5).cast("int")
    ).filter(F.col("seq") > 2 * batch - 1).repartitionByRange(
        4, "seq"
    ).write.mode("overwrite").parquet(f"{d}/ev2")
    ReplayRunner(spark, f"{d}/ev2", table, batch_size=batch).run()
    return table.read(spark).select(
        "repo", "path", "seq", "score", "stars", "content_sha256"
    )


def _cdc_grow_rebucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec evolution mid-replay through the REAL manifest
    machinery: two epochs land at 8 buckets, the table is grown 4x
    (LakeTable.grow_buckets — metadata-only, hash-mod refinement), and
    the remaining epochs replay at 32. The final read serves a MIXED
    layout — parents split lazily by the post-growth COW merges next to
    still-unsplit pre-growth buckets resolved through the manifest's
    spec map — and must hash-match a plain LWW oracle that knows nothing
    about bucketing. Any double-owned or lost key range diverges."""
    import tempfile

    from pyspark.sql import functions as F

    from arc_spark.cdc.bootstrap import create_table_for_stream
    from arc_spark.cdc.runner import ReplayRunner

    changes = _events_as_changes(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="cdcgrow_")
    changes.repartitionByRange(8, "seq").write.mode("overwrite").parquet(f"{d}/ev")
    table, _ = create_table_for_stream(spark, f"{d}/ev", f"{d}/lake", num_buckets=8)
    max_seq = int(changes.agg(F.max("seq")).first()[0])
    batch = max(1, max_seq // 4 + 1)
    ReplayRunner(spark, f"{d}/ev", table, batch_size=batch).run(max_epochs=2)
    table.grow_buckets(4, spark=spark)
    ReplayRunner(spark, f"{d}/ev", table, batch_size=batch).run()
    assert table.snapshot().num_buckets == 32
    return table.read(spark).select("repo", "path", "seq", "value", "content_sha256")


def _cdc_multi_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-database replication through the REAL multi-table machinery:
    the events table is mapped to ONE interleaved change stream carrying
    a ``table`` routing column ('files' / 'tags'), replayed via
    MultiTableReplay into a LakeCatalog — per-table LWW merges published
    as atomic cross-table version-set commits (arc_spark/lake/catalog.py)
    — and the union of both tables' final states must hash-match a plain
    DuckDB arg_max-LWW grouped by (table, repo, path)."""
    import tempfile

    from pyspark.sql import functions as F

    from arc_spark.cdc.multi import MultiTableReplay, bootstrap_catalog_for_stream

    ev = _load(spark, sf_dir, "events")["events"]
    changes = ev.select(
        F.col("event_id").alias("seq"),
        F.when(F.col("event_id") % 3 == 0, F.lit("tags"))
        .otherwise(F.lit("files"))
        .alias("table"),
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("op"),
        F.concat(F.lit("org"), (F.col("user_id") % 7).cast("string")).alias("repo"),
        F.concat(
            F.lit("f"),
            F.col("user_id").cast("string"),
            F.lit("/"),
            (F.col("event_id") % 3).cast("string"),
        ).alias("path"),
        F.col("value"),
        F.col("props").alias("content"),
    )
    d = tempfile.mkdtemp(prefix="cdcmulti_")
    changes.repartitionByRange(8, "seq").write.mode("overwrite").parquet(f"{d}/ev")
    catalog = bootstrap_catalog_for_stream(
        spark, f"{d}/ev", f"{d}/cat", num_buckets=8
    )
    max_seq = int(ev.agg(F.max("event_id")).first()[0])
    MultiTableReplay(
        spark, f"{d}/ev", catalog, batch_size=max(1, max_seq // 3 + 1), num_buckets=8
    ).run()
    parts = [
        catalog.read(spark, name)
        .select("repo", "path", "seq", "value", "content_sha256")
        .withColumn("table_name", F.lit(name))
        for name in ("files", "tags")
    ]
    return parts[0].unionByName(parts[1]).select(
        "table_name", "repo", "path", "seq", "value", "content_sha256"
    )


def _cdc_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-epoch merge where the ``metric`` column arrives as INT in the
    first half of the stream and as BIGINT (with values needing 64 bits)
    in the second: the table schema must widen in place and early
    narrow-typed rows must read back correctly under the widened schema
    (arc_spark/lake/table.py _safe_promotion)."""
    import tempfile

    from pyspark.sql import functions as F

    from arc_spark.lake.table import LakeTable

    ev = _load(spark, sf_dir, "events")["events"]
    cutoff = int(ev.agg(F.expr("max(event_id) DIV 2")).first()[0])
    base = ev.select(
        F.col("event_id").alias("seq"),
        F.lit("update").alias("op"),
        F.concat(F.lit("org"), (F.col("user_id") % 7).cast("string")).alias("repo"),
        F.concat(
            F.lit("f"),
            F.col("user_id").cast("string"),
            F.lit("/"),
            (F.col("event_id") % 3).cast("string"),
        ).alias("path"),
    )
    narrow = base.filter(F.col("seq") <= cutoff).withColumn(
        "metric", (F.col("seq") % 100).cast("int")
    )
    wide = base.filter(F.col("seq") > cutoff).withColumn(
        "metric", (F.col("seq") % 100 * F.lit(10_000_000_000) + F.col("seq")).cast("long")
    )
    from arc_spark.cdc.apply import last_writer_wins

    d = tempfile.mkdtemp(prefix="cdcwiden_")
    table = LakeTable(f"{d}/lake")
    table.create(narrow.drop("op").schema, ["repo", "path"], num_buckets=16)
    table.merge(
        spark, last_writer_wins(narrow, ["repo", "path"], "seq"),
        epoch=0, start_seq=0, end_seq=cutoff, mode="cow",
    )
    table.merge(
        spark, last_writer_wins(wide, ["repo", "path"], "seq"),
        epoch=1, start_seq=cutoff + 1,
        end_seq=int(ev.agg(F.max("event_id")).first()[0]), mode="cow",
    )
    return table.read(spark).select("repo", "path", "seq", "metric")


def _language_id_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arc_spark.operators.text import language_id

    docs = _load(spark, sf_dir, "documents")["documents"]
    return language_id(docs).select("doc_id", "lang", "lang_pred")


def _doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arc_spark.operators.text import quality_metrics

    docs = _load(spark, sf_dir, "documents")["documents"]
    return quality_metrics(docs).select(
        "doc_id", "n_tokens", "punct_ratio", "stopword_ratio", "quality_score"
    )


def _rank_topk(topk: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    return topk.select(
        F.row_number()
        .over(Window.orderBy(F.col("cosine_sim").desc(), F.col("vec_id")))
        .alias("rank"),
        "vec_id",
    )


def _doc_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/URL scrub pass (training-data hygiene): emails, URLs, IPv4s,
    phone-like digit runs replaced with typed tokens — pure regex chain,
    RE2-compatible so the oracle runs the same patterns."""
    from pyspark.sql import functions as F

    from arc_spark.operators.text import scrub_text

    docs = _load(spark, sf_dir, "documents")["documents"]
    return docs.select("doc_id", scrub_text(F.col("text")).alias("scrubbed"))


def _doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style quality gates (min tokens, punct/digit ratio caps), counted
    per language."""
    from pyspark.sql import functions as F

    from arc_spark.operators.text import quality_filter

    docs = _load(spark, sf_dir, "documents")["documents"]
    return quality_filter(docs).groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))


def _ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with the deterministic sample-Lloyd quantizer. The test
    corpus has no cluster structure around the query (its neighbors sit at
    cos≈0.3 and scatter across ALL clusters — verified offline), so any
    nprobe<k config has recall<1 by construction; the oracle therefore
    runs at nprobe=k, which certifies the full IVF machinery (hash-sample
    fit → vectorized centroid assignment → probe selection → exact
    re-rank) against brute force. Partition pruning with nprobe<k is
    pinned separately in tests/test_similarity.py against a numpy
    replication of the same deterministic pipeline.

    The query runs through the full PERSISTENCE round trip — build →
    write_index (cluster-partitioned parquet + centers meta) → load (no
    quantizer refit) → topk — certifying the served-index path, not just
    the in-memory one."""
    import tempfile

    from pyspark.sql import functions as F

    from arc_spark.operators.similarity import IVFIndex

    emb = _load(spark, sf_dir, "embeddings")["embeddings"]
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    path = tempfile.mkdtemp(prefix="ivf_idx_") + "/idx"
    IVFIndex.build(
        emb.filter(F.col("vec_id") != 0), k=8, seed=42
    ).write_index(path)
    loaded = IVFIndex.load(spark, path)
    return _rank_topk(loaded.topk(list(qvec), k=10, nprobe=8))


def _ann_ivf_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH retrieval through the persisted IVFIndex (write → load → one
    cluster-pruned scan answering 3 queries via the broadcast probe
    table). nprobe = n_clusters probes every cluster, reducing the IVF
    machinery (bounded-sample quantizer fit, matmul assignment, probe
    join, window re-rank) to exactly the brute-force batch answer — same
    oracle as knn_batch. Integer output only (query_id, rank, vec_id)."""
    import tempfile

    from pyspark.sql import functions as F

    from arc_spark.operators.similarity import IVFIndex

    emb = _load(spark, sf_dir, "embeddings")["embeddings"]
    qrows = emb.filter(F.col("vec_id") < 3).orderBy("vec_id").collect()
    queries = [(r["vec_id"], list(r["embedding"])) for r in qrows]
    path = tempfile.mkdtemp(prefix="ivf_batch_") + "/idx"
    IVFIndex.build(emb.filter(F.col("vec_id") >= 3), k=8, seed=42).write_index(path)
    idx = IVFIndex.load(spark, path)
    return idx.topk_batch(spark, queries, k=10, nprobe=8).select(
        "query_id", "rank", "vec_id"
    )


def _doc_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 25% sample of documents + leakage-free train/test
    split label — membership a pure integer function of doc_id (murmur3
    fmix32 finalizer), bit-identical in any engine / on any cluster
    size; the oracle runs the same formula in DuckDB."""
    from arc_spark.operators.sampling import deterministic_sample, split_train_test

    docs = _load(spark, sf_dir, "documents")["documents"]
    sampled = deterministic_sample(docs, 0.25, "doc_id", seed=11)
    return split_train_test(sampled, "doc_id", test_fraction=0.1, seed=99).select(
        "doc_id", "split"
    )


def _fmix_sql(expr: str, seed: int) -> str:
    """DuckDB expression replicating operators.sampling.fmix_hash
    verbatim: murmur3 fmix32 over (key XOR fmix32(seed)), multiplies
    split into 16-bit limbs exactly as the Spark Column form so every
    intermediate fits int64 in both engines."""
    from arc_spark.operators.sampling import FMIX_C1, FMIX_C2, seed_constant

    u32, u16 = 2**32, 2**16

    def mul32(h: str, c: int) -> str:
        return (
            f"((({h}) & 65535) * {c}"
            f" + ((({h}) >> 16) * {c} % {u16}) * {u16}) % {u32}"
        )

    def xorshift(h: str, bits: int) -> str:
        return f"xor({h}, ({h}) >> {bits})"

    h = f"xor(({expr}) % {u32}, {seed_constant(seed)})"
    h = xorshift(h, 16)
    h = mul32(h, FMIX_C1)
    h = xorshift(f"({h})", 13)
    h = mul32(h, FMIX_C2)
    return xorshift(f"({h})", 16)


_DOC_SAMPLE_SPLIT_SQL = f"""
    SELECT doc_id,
           CASE WHEN {_fmix_sql('doc_id', 99)} < {int(0.1 * (2**32))}
                THEN 'test' ELSE 'train' END AS split
    FROM documents
    WHERE {_fmix_sql('doc_id', 11)} < {int(0.25 * (2**32))}
"""


def _doc_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mix (the 'data recipe' step): two sources — even
    doc_ids at 60%, odd doc_ids at 25% — deterministically sampled on
    independent fmix32 streams (seed, seed+7919) and unioned with a
    provenance tag (operators.sampling.mix_datasets). Membership is a
    pure key function, so the DuckDB oracle runs the identical
    arithmetic."""
    from pyspark.sql import functions as F

    from arc_spark.operators.sampling import mix_datasets

    docs = _load(spark, sf_dir, "documents")["documents"]
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    return mix_datasets(
        [(even, 0.6), (odd, 0.25)], "doc_id", seed=5
    ).select("doc_id", "source")


_DOC_CORPUS_MIX_SQL = f"""
    SELECT doc_id, 0 AS source FROM documents
    WHERE doc_id % 2 = 0
      AND {_fmix_sql('doc_id', 5)} < {int(0.6 * (2**32))}
    UNION ALL
    SELECT doc_id, 1 AS source FROM documents
    WHERE doc_id % 2 = 1
      AND {_fmix_sql('doc_id', 5 + 7919)} < {int(0.25 * (2**32))}
"""


def _dedup_clusters_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: exact-verified minhash pairs (same
    recall-1 config as minhash_near_dup) → iterative min-label connected
    components → (doc_id, cluster-representative). The keep/drop decision
    a training pipeline actually consumes — checked against a DuckDB
    recursive transitive-closure oracle."""
    from arc_spark.operators.dedup import (
        dedup_clusters,
        hashed_shingle_table,
        minhash_near_dup,
        ngram_jaccard_pairs,
    )

    docs = _load(spark, sf_dir, "documents")["documents"]
    ht = hashed_shingle_table(docs, "text", "doc_id", shingle_n=3).persist()
    cand = minhash_near_dup(
        docs, "text", "doc_id", num_hashes=32, bands=16, jaccard_threshold=0.0,
        hashes_df=ht, max_bucket_size=None,
    )
    pairs = ngram_jaccard_pairs(
        docs, cand.select("id_a", "id_b"), "text", "doc_id",
        shingle_n=3, threshold=0.4, hashes_df=ht,
    )
    from pyspark.sql import functions as F

    return dedup_clusters(pairs).select(
        F.col("id").alias("id"), F.col("cluster").alias("cluster")
    )


def _dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE declarative dedup pipeline — NearDupTransform
    (recall-1 minhash config) → DedupClusterTransform (connected
    components) → DedupApplyTransform (keep one representative per
    cluster) — run through run_config, no SQL glue. Output is the keep
    set's doc_ids; the oracle derives the same set from a recursive
    transitive-closure CTE over exact Jaccard pairs."""
    from arc_spark.pipeline import run_config

    docs = _load(spark, sf_dir, "documents")["documents"]
    docs.createOrReplaceTempView("dedup_docs")
    cfg = {"stages": [
        {"type": "NearDupTransform", "name": "pairs", "inputView": "dedup_docs",
         "outputView": "dedup_pairs", "method": "minhash", "numHashes": 32,
         "bands": 16, "threshold": 0.4, "shingleN": 3, "maxBucketSize": 0},
        {"type": "DedupClusterTransform", "name": "cluster",
         "inputView": "dedup_pairs", "outputView": "dedup_clusters"},
        {"type": "DedupApplyTransform", "name": "apply",
         "inputView": "dedup_docs", "clusterView": "dedup_clusters",
         "outputView": "dedup_kept", "mode": "keep"},
    ]}
    df, _ = run_config(spark, cfg)
    return df.select("doc_id")


def _knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched exact retrieval: 3 query vectors against the corpus in ONE
    scan (mapInPandas matmul local top-k → window global top-k). Integer
    output only (query_id, rank, vec_id) — exact vs the DuckDB
    cross-join+window oracle."""
    from pyspark.sql import functions as F

    from arc_spark.operators.similarity import cosine_topk_batch

    emb = _load(spark, sf_dir, "embeddings")["embeddings"]
    qrows = emb.filter(F.col("vec_id") < 3).orderBy("vec_id").collect()
    queries = [(r["vec_id"], list(r["embedding"])) for r in qrows]
    out = cosine_topk_batch(emb.filter(F.col("vec_id") >= 3), queries, k=10)
    return out.select("query_id", "rank", "vec_id")


_KNN_BATCH_SQL = """
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < 3
    ), scored AS (
        SELECT q.query_id, e.vec_id,
               list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(q.qv, q.qv))) AS sim
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id >= 3
    ), ranked AS (
        SELECT query_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank,
               vec_id
        FROM scored
    )
    SELECT query_id, rank, vec_id FROM ranked WHERE rank <= 10
"""


def _ann_lsh_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED-index ANN path (LshIndex multi-table layout): build
    once, then the query reads only its bucket directory per band via
    partition pruning — the 100 TB serving shape, vs ann_lsh's scan-based
    form. Same recall-1 config (16 planes / 8 bands, verified offline), so
    it hash-matches the brute-force oracle too."""
    import tempfile

    from pyspark.sql import functions as F

    from arc_spark.operators.similarity import LshIndex

    emb = _load(spark, sf_dir, "embeddings")["embeddings"]
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    path = tempfile.mkdtemp(prefix="lsh_idx_") + "/idx"
    LshIndex.build_and_write(
        emb.filter(F.col("vec_id") != 0), path, num_planes=16, bands=8
    )
    return _rank_topk(LshIndex.load(spark, path).topk(spark, list(qvec), k=10))


def _ann_lsh_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH retrieval through the persisted LshIndex via the fully
    DISTRIBUTED path (topk_batch_df): the query set is a DataFrame
    end-to-end — band keys computed by the same executor-side Arrow
    matmul that built the index, only the distinct (band, bucket) int
    set ever reaching the driver (for partition pruning), probe-join +
    JVM exact re-rank. No query-count cap, no driver collect of vectors
    — the 10^6-query retrieval-epoch shape; topk_batch remains for
    driver-resident lists. 32 planes / 16 bands keeps every exact top-10
    member of all 3 queries in the candidate set at sf0.001 and sf0.01
    (verified offline), so the result hash-matches the brute-force batch
    oracle. Integer output only (query_id, rank, vec_id)."""
    import tempfile

    from pyspark.sql import functions as F

    from arc_spark.operators.similarity import LshIndex

    emb = _load(spark, sf_dir, "embeddings")["embeddings"]
    query_view = emb.filter(F.col("vec_id") < 3)
    path = tempfile.mkdtemp(prefix="lsh_batch_") + "/idx"
    idx = LshIndex.build_and_write(
        emb.filter(F.col("vec_id") >= 3), path, num_planes=32, bands=16
    )
    return idx.topk_batch_df(
        spark, query_view, query_id_col="vec_id", k=10
    ).select("query_id", "rank", "vec_id")


def _ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN. 16 planes / 8 bands keeps every exact top-10
    member in the candidate set at all test SFs (verified offline), so the
    result hash-matches the brute-force oracle."""
    from pyspark.sql import functions as F

    from arc_spark.operators.similarity import lsh_topk

    emb = _load(spark, sf_dir, "embeddings")["embeddings"]
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return _rank_topk(
        lsh_topk(emb.filter(F.col("vec_id") != 0), list(qvec), k=10, bands=8)
    )


def _asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: for each event, the most recent order by the
    same key (user_id = o_custkey) with o_orderdate <= ts."""
    from pyspark.sql import functions as F

    from arc_spark.operators.asof import asof_join

    t = _load(spark, sf_dir, "events", "orders")
    left = t["events"].select(F.col("user_id").alias("k"), "ts", "event_id")
    right = t["orders"].select(
        F.col("o_custkey").alias("k"), "o_orderdate", "o_orderkey"
    )
    out = asof_join(
        left, right, keys=["k"], left_time="ts", right_time="o_orderdate"
    )
    return out.select(
        "event_id",
        F.col("r_o_orderkey").alias("matched_orderkey"),
        F.col("r_o_orderdate").alias("matched_orderdate"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering note (round-5 verdict item #1): the driver's correctness
    # artifact records the FIRST 50 registry entries, so the newest /
    # highest-risk queries (doc_sample_split, doc_corpus_mix, dedup_apply,
    # ann_ivf, ann_ivf_batch — never driver-recorded before) now sit
    # inside the first 50. Five entries whose operators are each covered
    # by other in-cap rows rotate to the tail (lineitem_profile ←
    # statistics_lineitem; lang_quality_summary ← language_id + doc_quality
    # + doc_quality_filter; ann_lsh ← ann_lsh_indexed/_batch; knn_batch ←
    # knn_brute + ann_ivf_batch, same brute-force oracle; part_string_funcs
    # ← the scrub/json string-expression rows). ALL 55 stay declared and
    # oracle-backed — nothing is removed.
    return {
        "q1_pricing_summary": _q1_pricing_summary,
        "q3_segment_revenue": _q3_segment_revenue,
        "q5_region_volume": _q5_region_volume,
        "top_orders_per_segment": _top_orders_per_segment,
        "events_hourly": _events_hourly,
        "events_json": _events_json,
        "dedup_exact_documents": _dedup_exact_documents,
        "doc_token_stats": _doc_token_stats,
        "knn_brute": _knn_brute,
        "cdc_lww_events": _cdc_lww_events,
        "doc_sample_split": _doc_sample_split,
        "doc_corpus_mix": _doc_corpus_mix,
        "dedup_apply": _dedup_apply,
        "ann_ivf": _ann_ivf,
        "ann_ivf_batch": _ann_ivf_batch,
        "cdc_scd2": _cdc_scd2,
        "cdc_debezium": _cdc_debezium,
        "cdc_tx_gate": _cdc_tx_gate,
        "diff_views": _diff_views,
        "rollup_order_stats": _rollup_order_stats,
        "customers_without_orders": _customers_without_orders,
        "top_supplier_per_nation": _top_supplier_per_nation,
        "user_sessions": _user_sessions,
        "asof_latest_order": _asof_latest_order,
        "shipmode_priority": _shipmode_priority,
        "promo_share": _promo_share,
        # approximate / full-engine operators — oracle-checked via exact
        # brute-force equivalents (recall-1 configs, see docstrings):
        "minhash_near_dup": _minhash_near_dup,
        "simhash_near_dup": _simhash_near_dup,
        "embedding_near_dup": _embedding_near_dup,
        "statistics_lineitem": _statistics_lineitem,
        "cdc_replay_mini": _cdc_replay_mini,
        "iceberg_round_trip": _iceberg_round_trip,
        "iceberg_round_trip_mor": _iceberg_round_trip_mor,
        "iceberg_landing_tail": _iceberg_landing_tail,
        "iceberg_compaction_loop": _iceberg_compaction_loop,
        "cdc_bootstrap": _cdc_bootstrap,
        "cdc_quarantine": _cdc_quarantine,
        "cdc_rollback": _cdc_rollback,
        "cdc_changes_since": _cdc_changes_since,
        "cdc_alter_rename": _cdc_alter_rename,
        "cdc_grow_rebucket": _cdc_grow_rebucket,
        "cdc_multi_table": _cdc_multi_table,
        "cdc_type_widening": _cdc_type_widening,
        "language_id_documents": _language_id_documents,
        "doc_quality": _doc_quality,
        "doc_scrub": _doc_scrub,
        "doc_quality_filter": _doc_quality_filter,
        "ann_lsh_indexed": _ann_lsh_indexed,
        "ann_lsh_batch": _ann_lsh_batch,
        "dedup_clusters_minhash": _dedup_clusters_minhash,
        # --- entries 51+ (operators covered by in-cap rows, see note) ---
        "lineitem_profile": _lineitem_profile,
        "lang_quality_summary": _lang_quality_summary,
        "part_string_funcs": _part_string_funcs,
        "ann_lsh": _ann_lsh,
        "knn_batch": _knn_batch,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_DEC = "DECIMAL(18,4)"


def _jaccard_pairs_sql(threshold: float) -> str:
    """Brute-force exact word-3gram Jaccard pairs ≥ threshold (inverted
    index, not all-pairs) — the oracle for the LSH near-dup queries, whose
    verify stage reduces them to exactly this set when candidate recall
    is 1 (see the query docstrings for the recall argument)."""
    return rf"""
        WITH d AS (
          SELECT doc_id, trim(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
          FROM documents
        ), t AS (
          SELECT doc_id, string_split(norm, ' ') AS w FROM d
        ), s AS (
          SELECT doc_id,
                 list_distinct([array_to_string(w[i:i+2], ' ')
                                for i in range(1, greatest(len(w)-2, 1)+1)]) AS sh
          FROM t
        ), e AS (
          SELECT doc_id, unnest(sh) AS g FROM s
        ), c AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT c.id_a, c.id_b,
               CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
        FROM c
        JOIN (SELECT doc_id, len(sh) AS n FROM s) sa ON sa.doc_id = c.id_a
        JOIN (SELECT doc_id, len(sh) AS n FROM s) sb ON sb.doc_id = c.id_b
        WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= {threshold}
    """


def _dedup_clusters_sql(threshold: float) -> str:
    """Connected components over the exact-Jaccard pair graph via a
    recursive transitive-closure CTE; cluster = min reachable doc_id."""
    pairs = _jaccard_pairs_sql(threshold)
    return f"""
        WITH RECURSIVE pairs AS ({pairs}),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b AS src, id_a AS dst FROM pairs
        ),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT src AS id, least(src, min(dst)) AS cluster
        FROM reach GROUP BY src
    """


def _dedup_apply_sql(threshold: float) -> str:
    """Keep set after dedup: every document except non-representative
    cluster members (cluster = min reachable id over the exact-Jaccard
    pair graph — same closure as _dedup_clusters_sql)."""
    pairs = _jaccard_pairs_sql(threshold)
    return f"""
        WITH RECURSIVE pairs AS ({pairs}),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b AS src, id_a AS dst FROM pairs
        ),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ),
        cl AS (
          SELECT src AS id, least(src, min(dst)) AS cluster
          FROM reach GROUP BY src
        )
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT id FROM cl WHERE id <> cluster)
    """


_BRUTE_TOPK_SQL = """
    WITH q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    ), scored AS (
        SELECT e.vec_id,
               list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(q.qv, q.qv))) AS sim
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> 0
    )
    SELECT ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS rank, vec_id
    FROM scored ORDER BY sim DESC, vec_id LIMIT 10
"""

# (column name, spark simpleString type, kind) for the statistics oracle
_LINEITEM_COLS = [
    ("l_orderkey", "bigint", "num"),
    ("l_partkey", "bigint", "num"),
    ("l_suppkey", "bigint", "num"),
    ("l_linenumber", "int", "num"),
    ("l_quantity", "double", "num"),
    ("l_extendedprice", "double", "num"),
    ("l_discount", "double", "num"),
    ("l_tax", "double", "num"),
    ("l_returnflag", "string", "str"),
    ("l_linestatus", "string", "str"),
    ("l_shipdate", "timestamp_ntz", "other"),
]


def _statistics_oracle_sql() -> str:
    parts = []
    for name, dtype, kind in _LINEITEM_COLS:
        if kind == "num":
            mean = (
                f"CAST(SUM(CAST(CAST({name} AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE)"
                f" / COUNT({name})"
            )
            mn, mx = f"CAST(MIN({name}) AS DOUBLE)", f"CAST(MAX({name}) AS DOUBLE)"
        else:
            mean = mn = mx = "CAST(NULL AS DOUBLE)"
        if kind == "str":
            minlen = f"CAST(MIN(length({name})) AS DOUBLE)"
            avglen = f"AVG(length({name}))"
            maxlen = f"CAST(MAX(length({name})) AS DOUBLE)"
        else:
            minlen = avglen = maxlen = "CAST(NULL AS DOUBLE)"
        parts.append(f"""
            SELECT '{name}' AS col_name, '{dtype}' AS data_type,
                   COUNT({name}) AS count,
                   COUNT(DISTINCT {name}) AS distinct_count,
                   COUNT(*) - COUNT({name}) AS null_count,
                   {mean} AS mean, {mn} AS min, {mx} AS max,
                   {minlen} AS minlen, {avglen} AS avglen, {maxlen} AS maxlen
            FROM lineitem""")
    return " UNION ALL ".join(parts)


def _lang_hits_sql(col: str, markers: list[str]) -> str:
    terms = []
    for m in markers:
        esc = m.replace("'", "''")
        terms.append(
            f"CAST((length({col}) - length(replace({col}, '{esc}', ''))) / {len(m)} AS INT)"
        )
    return " + ".join(terms)


def _doc_scrub_oracle_sql() -> str:
    """Same RE2-safe pattern chain, same order, global replacement."""
    from arc_spark.operators.text import _SCRUB_PATTERNS

    expr = "text"
    for _kind, pattern, token in _SCRUB_PATTERNS:
        esc = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{esc}', '{token}', 'g')"
    return f"SELECT doc_id, {expr} AS scrubbed FROM documents"


def _language_id_oracle_sql() -> str:
    """Replicates operators.text.language_id: per-language marker hit
    counts, argmax via sorted (score, lang) structs — struct comparison is
    field-order lexicographic in both engines."""
    from arc_spark.operators.text import _LANG_MARKERS

    score_cols = ", ".join(
        f"{_lang_hits_sql('cc', m)} AS s_{lang}" for lang, m in _LANG_MARKERS.items()
    )
    structs = ", ".join(
        f"struct_pack(score := s_{lang}, lang := '{lang}')" for lang in _LANG_MARKERS
    )
    return f"""
        WITH c AS (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS cc FROM documents),
        s AS (SELECT doc_id, lang, {score_cols} FROM c),
        b AS (SELECT doc_id, lang, list_sort([{structs}])[-1] AS best FROM s)
        SELECT doc_id, lang,
               CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS lang_pred
        FROM b
    """


def _doc_quality_oracle_sql() -> str:
    """Replicates operators.text.quality_metrics for the harness-projected
    columns; the composite score is written with the exact same operation
    tree so the double arithmetic is bit-identical."""
    from arc_spark.operators.text import _STOPWORDS

    stops = ", ".join(f"'{w}'" for w in _STOPWORDS)
    return rf"""
        WITH m AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
                   length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct,
                   length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
                   len(list_intersect(regexp_split_to_array(lower(trim(text)), '\s+'),
                                      [{stops}])) AS n_stop
            FROM documents
        ), r AS (
            SELECT doc_id, n_tokens,
                   CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) AS punct_ratio,
                   CAST(n_digit AS DOUBLE) / greatest(n_chars, 1) AS digit_ratio,
                   CAST(n_stop AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) AS stopword_ratio
            FROM m
        )
        SELECT doc_id, n_tokens, punct_ratio, stopword_ratio,
               least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
               + (1.0 - least(punct_ratio * 4.0, 1.0)) * 0.3
               + (1.0 - least(digit_ratio * 4.0, 1.0)) * 0.3 AS quality_score
        FROM r
    """


def oracle_sql() -> dict[str, str]:
    oracles = {
        "q1_pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS {_DEC})) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(l_extendedprice AS {_DEC}) * (CAST(1 AS {_DEC}) - CAST(l_discount AS {_DEC}))) AS DOUBLE) AS sum_disc_price,
                   CAST(SUM(CAST(l_extendedprice AS {_DEC}) * (CAST(1 AS {_DEC}) - CAST(l_discount AS {_DEC})) * (CAST(1 AS {_DEC}) + CAST(l_tax AS {_DEC}))) AS DOUBLE) AS sum_charge,
                   CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) / COUNT(*) AS avg_qty,
                   CAST(SUM(CAST(l_discount AS {_DEC})) AS DOUBLE) / COUNT(*) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_segment_revenue": f"""
            SELECT o_orderkey, o_orderdate,
                   CAST(SUM(CAST(l_extendedprice AS {_DEC}) * (CAST(1 AS {_DEC}) - CAST(l_discount AS {_DEC}))) AS DOUBLE) AS revenue
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
              AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        "q5_region_volume": f"""
            SELECT r_name, n_name,
                   CAST(SUM(CAST(l_extendedprice AS {_DEC}) * (CAST(1 AS {_DEC}) - CAST(l_discount AS {_DEC}))) AS DOUBLE) AS revenue,
                   COUNT(*) AS n_items
            FROM region
            JOIN nation   ON n_regionkey = r_regionkey
            JOIN customer ON c_nationkey = n_nationkey
            JOIN orders   ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
            GROUP BY r_name, n_name
        """,
        "top_orders_per_segment": """
            SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
                SELECT c_mktsegment, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM customer JOIN orders ON o_custkey = c_custkey
            ) WHERE rn <= 3
        """,
        "events_hourly": f"""
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(value AS {_DEC})) AS DOUBLE) AS sum_value,
                   COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        "events_json": """
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
                   COUNT(*) AS n,
                   MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
            FROM events GROUP BY 1, 2
        """,
        "lineitem_profile": f"""
            SELECT 'l_quantity' AS col_name, COUNT(l_quantity) AS cnt,
                   COUNT(DISTINCT l_quantity) AS distinct_cnt,
                   COUNT(*) - COUNT(l_quantity) AS null_cnt,
                   CAST(MIN(l_quantity) AS DOUBLE) AS min_val,
                   CAST(MAX(l_quantity) AS DOUBLE) AS max_val,
                   CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) / COUNT(l_quantity) AS mean_val
            FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice', COUNT(l_extendedprice),
                   COUNT(DISTINCT l_extendedprice),
                   COUNT(*) - COUNT(l_extendedprice),
                   CAST(MIN(l_extendedprice) AS DOUBLE),
                   CAST(MAX(l_extendedprice) AS DOUBLE),
                   CAST(SUM(CAST(l_extendedprice AS {_DEC})) AS DOUBLE) / COUNT(l_extendedprice)
            FROM lineitem
        """,
        "dedup_exact_documents": r"""
            SELECT doc_id, lang, source, n_chars FROM documents
            WHERE doc_id IN (
                SELECT MIN(doc_id) FROM documents
                GROUP BY trim(lower(regexp_replace(text, '\s+', ' ', 'g')))
            )
        """,
        "doc_token_stats": r"""
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE length(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
                   length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct,
                   length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
                   length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper,
                   length(text) AS n_chars_calc
            FROM documents
        """,
        "lang_quality_summary": f"""
            SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_sources,
                   CAST(SUM(CAST(n_chars AS {_DEC})) AS DOUBLE) / COUNT(*) AS avg_chars,
                   MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
            FROM documents GROUP BY lang
        """,
        "knn_brute": """
            WITH q AS (
                SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
            ), scored AS (
                SELECT e.vec_id,
                       list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(q.qv, q.qv))) AS sim
                FROM embeddings e CROSS JOIN q
                WHERE e.vec_id <> 0
            )
            SELECT ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS rank, vec_id
            FROM scored ORDER BY sim DESC, vec_id LIMIT 10
        """,
        "cdc_lww_events": r"""
            WITH w AS (
                SELECT user_id,
                       max(event_id) AS last_seq,
                       arg_max(event_type, event_id) AS event_type,
                       arg_max(value, event_id) AS value,
                       arg_max(props, event_id) AS props
                FROM events GROUP BY user_id
            )
            SELECT user_id, last_seq, event_type, value,
                   regexp_replace(regexp_replace(regexp_replace(props, '\r\n', E'\n', 'g'), '[ \t]+\n', E'\n', 'g'), '[ \t\r\n\f\x0b]+$', '') AS props,
                   sha256(regexp_replace(regexp_replace(regexp_replace(props, '\r\n', E'\n', 'g'), '[ \t]+\n', E'\n', 'g'), '[ \t\r\n\f\x0b]+$', '')) AS content_sha256
            FROM w WHERE event_type <> 'error'
        """,
        "cdc_scd2": """
            WITH c AS (
                SELECT event_id AS seq,
                       CASE WHEN event_type = 'error' THEN 'delete'
                            ELSE 'upsert' END AS op,
                       user_id, event_type, value
                FROM events
            ), h AS (
                SELECT user_id, event_type, value, op,
                       seq AS valid_from_seq,
                       LEAD(seq) OVER (PARTITION BY user_id ORDER BY seq)
                           AS valid_to_seq
                FROM c
            )
            SELECT user_id, valid_from_seq, valid_to_seq,
                   (valid_to_seq IS NULL) AS is_current,
                   event_type, value
            FROM h WHERE op <> 'delete'
        """,
        "cdc_debezium": """
            WITH w AS (
                SELECT user_id,
                       max(event_id) AS last_seq,
                       arg_max(event_type, event_id) AS event_type,
                       arg_max(value, event_id) AS value,
                       arg_max(props, event_id) AS props
                FROM events GROUP BY user_id
            )
            SELECT user_id, last_seq, event_type, value, props
            FROM w WHERE event_type <> 'error'
        """,
        # horizon in closed form: max h s.t. no tx spans h and no
        # incomplete tx starts <= h (the fixpoint of the engine's
        # downward iteration — see _cdc_tx_gate docstring). In this
        # fixture END-exists <=> last_full <= cutoff, and then every
        # event of that tx is in the tail, so complete <=> last_full
        # <= cutoff.
        "cdc_tx_gate": """
            WITH ev AS (
                SELECT event_id AS seq, user_id, event_type, value, props,
                       event_id % 64 AS m, event_id // 64 AS blk
                FROM events
            ), tx AS (
                SELECT *,
                       CASE WHEN m < 48
                            THEN 'c' || CAST(blk AS VARCHAR) || '_'
                                     || CAST(m // 8 AS VARCHAR)
                            WHEN m <= 53 OR m IN (55, 57)
                            THEN 'a' || CAST(blk AS VARCHAR)
                            ELSE 'b' || CAST(blk AS VARCHAR) END AS tx_id
                FROM ev
            ), cut AS (
                SELECT ((MAX(seq) // 64) - 1) * 64 + 60 AS cutoff FROM ev
            ), fullagg AS (
                SELECT tx_id, MAX(seq) AS last_full FROM tx GROUP BY tx_id
            ), tail AS (
                SELECT t.* FROM tx t, cut WHERE t.seq <= cut.cutoff
            ), spans AS (
                SELECT t.tx_id, MIN(t.seq) AS fs, MAX(t.seq) AS ls,
                       (f.last_full <= (SELECT cutoff FROM cut)) AS complete
                FROM tail t JOIN fullagg f USING (tx_id)
                GROUP BY t.tx_id, f.last_full
            ), cand AS (
                SELECT fs - 1 AS h FROM spans
                UNION ALL SELECT cutoff AS h FROM cut
            ), good AS (
                SELECT h FROM cand
                WHERE NOT EXISTS (SELECT 1 FROM spans s
                                  WHERE s.fs <= h AND h < s.ls)
                  AND NOT EXISTS (SELECT 1 FROM spans s
                                  WHERE NOT s.complete AND s.fs <= h)
            ), hz AS (SELECT MAX(h) AS h FROM good),
            w AS (
                SELECT user_id, MAX(seq) AS last_seq,
                       arg_max(event_type, seq) AS event_type,
                       arg_max(value, seq) AS value,
                       arg_max(props, seq) AS props
                FROM tail, hz WHERE seq <= hz.h
                GROUP BY user_id
            )
            SELECT user_id, last_seq, event_type, value, props
            FROM w WHERE event_type <> 'error'
        """,
        "diff_views": """
            SELECT o_orderkey, o_orderstatus
            FROM orders WHERE o_totalprice > 50000
            EXCEPT
            SELECT o_orderkey, o_orderstatus
            FROM orders WHERE o_orderstatus = 'O'
        """,
        "rollup_order_stats": f"""
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                   CAST(SUM(CAST(o_totalprice AS {_DEC})) AS DOUBLE) AS sum_price
            FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "top_supplier_per_nation": """
            SELECT n_name, s_suppkey, s_name, s_acctbal
            FROM supplier JOIN nation ON n_nationkey = s_nationkey
            WHERE s_acctbal = (
                SELECT MAX(s2.s_acctbal) FROM supplier s2
                WHERE s2.s_nationkey = supplier.s_nationkey
            )
        """,
        "user_sessions": """
            WITH g AS (
                SELECT user_id,
                       CASE WHEN ts - lag(ts) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                            > INTERVAL 1800 SECOND
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
            )
            SELECT user_id, CAST(SUM(new_sess) + 1 AS BIGINT) AS n_sessions,
                   COUNT(*) AS n_events
            FROM g GROUP BY user_id
        """,
        "asof_latest_order": """
            SELECT e.event_id,
                   o.o_orderkey AS matched_orderkey,
                   o.o_orderdate AS matched_orderdate
            FROM events e
            ASOF LEFT JOIN orders o
              ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        """,
        "shipmode_priority": """
            SELECT l_returnflag,
                   COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH')) AS high_line_count,
                   COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH')) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
            GROUP BY l_returnflag
        """,
        "promo_share": f"""
            SELECT ROUND(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                       THEN CAST(CAST(l_extendedprice AS {_DEC}) * (CAST(1 AS {_DEC}) - CAST(l_discount AS {_DEC})) AS DECIMAL(38,8))
                       ELSE CAST(0 AS DECIMAL(38,8)) END) AS DOUBLE)
                   / CAST(SUM(CAST(CAST(l_extendedprice AS {_DEC}) * (CAST(1 AS {_DEC}) - CAST(l_discount AS {_DEC})) AS DECIMAL(38,8))) AS DOUBLE), 12)
                   AS promo_share,
                   COUNT(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
        """,
        "part_string_funcs": """
            SELECT p_partkey,
                   upper(p_name) AS name_upper,
                   substring(p_type, 1, 5) AS type_prefix,
                   length(p_name) AS name_len,
                   regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
                   concat_ws('|', p_brand, p_type) AS brand_type,
                   reverse(p_brand) AS brand_rev
            FROM part
        """,
        "minhash_near_dup": _jaccard_pairs_sql(0.4),
        "simhash_near_dup": _jaccard_pairs_sql(0.7),
        "embedding_near_dup": """
            WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM v a JOIN v b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.ve, b.ve)
                  / (sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b.ve, b.ve)))
                  >= 0.5
        """,
        "ann_lsh": _BRUTE_TOPK_SQL,
        "ann_lsh_indexed": _BRUTE_TOPK_SQL,
        "knn_batch": _KNN_BATCH_SQL,
        # recall-1 LSH config (see _ann_lsh_batch docstring) reduces the
        # indexed batch retrieval to exactly the brute-force batch answer
        "ann_lsh_batch": _KNN_BATCH_SQL,
        "dedup_clusters_minhash": _dedup_clusters_sql(0.4),
        "dedup_apply": _dedup_apply_sql(0.4),
        "doc_sample_split": _DOC_SAMPLE_SPLIT_SQL,
        "doc_corpus_mix": _DOC_CORPUS_MIX_SQL,
        "ann_ivf": _BRUTE_TOPK_SQL,
        # nprobe = n_clusters reduces batched IVF to the brute batch oracle
        "ann_ivf_batch": _KNN_BATCH_SQL,
        "statistics_lineitem": _statistics_oracle_sql(),
        "cdc_replay_mini": r"""
            WITH c AS (
                SELECT event_id AS seq,
                       CASE WHEN event_type = 'error' THEN 'delete' ELSE 'update' END AS op,
                       'org' || CAST(user_id % 7 AS VARCHAR) AS repo,
                       'f' || CAST(user_id AS VARCHAR) || '/' || CAST(event_id % 3 AS VARCHAR) AS path,
                       substring(sha256(CAST(event_id AS VARCHAR)), 1, 40) AS "commit",
                       value, props AS content
                FROM events
            ), w AS (
                SELECT repo, path, max(seq) AS seq,
                       arg_max(op, seq) AS op, arg_max("commit", seq) AS "commit",
                       arg_max(value, seq) AS value, arg_max(content, seq) AS content
                FROM c GROUP BY repo, path
            )
            SELECT repo, path, seq, "commit", value,
                   sha256(regexp_replace(regexp_replace(regexp_replace(content, '\r\n', E'\n', 'g'), '[ \t]+\n', E'\n', 'g'), '[ \t\r\n\f\x0b]+$', '')) AS content_sha256
            FROM w WHERE op <> 'delete'
        """,
        # the handoff seam is physical only — the bootstrap query's oracle
        # is the SAME plain LWW over the whole stream as cdc_replay_mini
        # (snapshot-vs-tail provenance must be invisible in the result)
        "cdc_bootstrap": r"""
            WITH c AS (
                SELECT event_id AS seq,
                       CASE WHEN event_type = 'error' THEN 'delete' ELSE 'update' END AS op,
                       'org' || CAST(user_id % 7 AS VARCHAR) AS repo,
                       'f' || CAST(user_id AS VARCHAR) || '/' || CAST(event_id % 3 AS VARCHAR) AS path,
                       substring(sha256(CAST(event_id AS VARCHAR)), 1, 40) AS "commit",
                       value, props AS content
                FROM events
            ), w AS (
                SELECT repo, path, max(seq) AS seq,
                       arg_max(op, seq) AS op, arg_max("commit", seq) AS "commit",
                       arg_max(value, seq) AS value, arg_max(content, seq) AS content
                FROM c GROUP BY repo, path
            )
            SELECT repo, path, seq, "commit", value,
                   sha256(regexp_replace(regexp_replace(regexp_replace(content, '\r\n', E'\n', 'g'), '[ \t]+\n', E'\n', 'g'), '[ \t\r\n\f\x0b]+$', '')) AS content_sha256
            FROM w WHERE op <> 'delete'
        """,
        "cdc_multi_table": r"""
            WITH c AS (
                SELECT event_id AS seq,
                       CASE WHEN event_id % 3 = 0 THEN 'tags' ELSE 'files' END AS table_name,
                       CASE WHEN event_type = 'error' THEN 'delete' ELSE 'update' END AS op,
                       'org' || CAST(user_id % 7 AS VARCHAR) AS repo,
                       'f' || CAST(user_id AS VARCHAR) || '/' || CAST(event_id % 3 AS VARCHAR) AS path,
                       value, props AS content
                FROM events
            ), w AS (
                SELECT table_name, repo, path, max(seq) AS seq,
                       arg_max(op, seq) AS op,
                       arg_max(value, seq) AS value, arg_max(content, seq) AS content
                FROM c GROUP BY table_name, repo, path
            )
            SELECT table_name, repo, path, seq, value,
                   sha256(regexp_replace(regexp_replace(regexp_replace(content, '\r\n', E'\n', 'g'), '[ \t]+\n', E'\n', 'g'), '[ \t\r\n\f\x0b]+$', '')) AS content_sha256
            FROM w WHERE op <> 'delete'
        """,
        "cdc_rollback": r"""
            WITH c AS (
                SELECT event_id AS seq,
                       CASE WHEN event_type = 'error' THEN 'delete' ELSE 'update' END AS op,
                       'org' || CAST(user_id % 7 AS VARCHAR) AS repo,
                       'f' || CAST(user_id AS VARCHAR) || '/' || CAST(event_id % 3 AS VARCHAR) AS path,
                       value, props AS content
                FROM events
            ), w AS (
                SELECT repo, path, max(seq) AS seq,
                       arg_max(op, seq) AS op,
                       arg_max(value, seq) AS value, arg_max(content, seq) AS content
                FROM c GROUP BY repo, path
            )
            SELECT repo, path, seq, value,
                   sha256(regexp_replace(regexp_replace(regexp_replace(content, '\r\n', E'\n', 'g'), '[ \t]+\n', E'\n', 'g'), '[ \t\r\n\f\x0b]+$', '')) AS content_sha256
            FROM w WHERE op <> 'delete'
        """,
        # bucketing is physical layout only — the growth query's oracle is
        # the SAME plain LWW as cdc_replay_mini (bucket count must be
        # invisible in the result)
        "cdc_changes_since": r"""
            WITH c AS (
                SELECT event_id AS seq,
                       CASE WHEN event_type = 'error' THEN 'delete' ELSE 'update' END AS op,
                       'org' || CAST(user_id % 7 AS VARCHAR) AS repo,
                       'f' || CAST(user_id AS VARCHAR) || '/' || CAST(event_id % 3 AS VARCHAR) AS path,
                       value, props AS content
                FROM events
            ), cut AS (
                -- epoch-1 end: 2 * batch - 1 with batch = max_seq // 4 + 1
                SELECT 2 * ((MAX(seq) // 4) + 1) - 1 AS cursor FROM c
            ), w AS (
                SELECT repo, path, max(seq) AS last_seq,
                       arg_max(op, seq) AS op,
                       arg_max(value, seq) AS value, arg_max(content, seq) AS content
                FROM c GROUP BY repo, path
            )
            SELECT repo, path,
                   CASE WHEN op = 'delete' THEN 'delete' ELSE 'upsert' END AS op,
                   last_seq, value,
                   sha256(regexp_replace(regexp_replace(regexp_replace(content, '\r\n', E'\n', 'g'), '[ \t]+\n', E'\n', 'g'), '[ \t\r\n\f\x0b]+$', '')) AS content_sha256
            FROM w, cut WHERE last_seq > cut.cursor
        """,
        "cdc_alter_rename": r"""
            WITH c AS (
                SELECT event_id AS seq,
                       CASE WHEN event_type = 'error' THEN 'delete' ELSE 'update' END AS op,
                       'org' || CAST(user_id % 7 AS VARCHAR) AS repo,
                       'f' || CAST(user_id AS VARCHAR) || '/' || CAST(event_id % 3 AS VARCHAR) AS path,
                       value, props AS content
                FROM events
            ), cut AS (
                SELECT 2 * ((MAX(seq) // 4) + 1) - 1 AS cursor FROM c
            ), w AS (
                SELECT repo, path, max(seq) AS seq,
                       arg_max(op, seq) AS op,
                       arg_max(value, seq) AS value, arg_max(content, seq) AS content
                FROM c GROUP BY repo, path
            )
            SELECT repo, path, seq, value AS score,
                   CASE WHEN seq > cut.cursor THEN CAST(seq % 5 AS INTEGER) END AS stars,
                   sha256(regexp_replace(regexp_replace(regexp_replace(content, '\r\n', E'\n', 'g'), '[ \t]+\n', E'\n', 'g'), '[ \t\r\n\f\x0b]+$', '')) AS content_sha256
            FROM w, cut WHERE op <> 'delete'
        """,
        "cdc_grow_rebucket": r"""
            WITH c AS (
                SELECT event_id AS seq,
                       CASE WHEN event_type = 'error' THEN 'delete' ELSE 'update' END AS op,
                       'org' || CAST(user_id % 7 AS VARCHAR) AS repo,
                       'f' || CAST(user_id AS VARCHAR) || '/' || CAST(event_id % 3 AS VARCHAR) AS path,
                       value, props AS content
                FROM events
            ), w AS (
                SELECT repo, path, max(seq) AS seq,
                       arg_max(op, seq) AS op,
                       arg_max(value, seq) AS value, arg_max(content, seq) AS content
                FROM c GROUP BY repo, path
            )
            SELECT repo, path, seq, value,
                   sha256(regexp_replace(regexp_replace(regexp_replace(content, '\r\n', E'\n', 'g'), '[ \t]+\n', E'\n', 'g'), '[ \t\r\n\f\x0b]+$', '')) AS content_sha256
            FROM w WHERE op <> 'delete'
        """,
        "cdc_quarantine": r"""
            WITH c AS (
                SELECT event_id AS seq,
                       CASE WHEN event_id % 53 = 0 THEN 'chaos'
                            WHEN event_type = 'error' THEN 'delete'
                            ELSE 'update' END AS op,
                       'org' || CAST(user_id % 7 AS VARCHAR) AS repo,
                       CASE WHEN event_id % 59 = 0 THEN NULL
                            ELSE 'f' || CAST(user_id AS VARCHAR) || '/' || CAST(event_id % 3 AS VARCHAR) END AS path,
                       value, props AS content
                FROM events
            ), v AS (
                SELECT * FROM c
                WHERE op IN ('update','delete') AND path IS NOT NULL AND seq IS NOT NULL
            ), w AS (
                SELECT repo, path, max(seq) AS seq,
                       arg_max(op, seq) AS op,
                       arg_max(value, seq) AS value, arg_max(content, seq) AS content
                FROM v GROUP BY repo, path
            )
            SELECT repo, path, seq, value,
                   sha256(regexp_replace(regexp_replace(regexp_replace(content, '\r\n', E'\n', 'g'), '[ \t]+\n', E'\n', 'g'), '[ \t\r\n\f\x0b]+$', '')) AS content_sha256
            FROM w WHERE op <> 'delete'
        """,
        "cdc_type_widening": r"""
            WITH mx AS (SELECT CAST(max(event_id) AS BIGINT) // 2 AS cutoff FROM events),
            c AS (
                SELECT event_id AS seq,
                       'org' || CAST(user_id % 7 AS VARCHAR) AS repo,
                       'f' || CAST(user_id AS VARCHAR) || '/' || CAST(event_id % 3 AS VARCHAR) AS path,
                       CASE WHEN event_id <= (SELECT cutoff FROM mx)
                            THEN CAST(event_id % 100 AS BIGINT)
                            ELSE event_id % 100 * 10000000000 + event_id END AS metric
                FROM events
            ), w AS (
                SELECT repo, path, max(seq) AS seq, arg_max(metric, seq) AS metric
                FROM c GROUP BY repo, path
            )
            SELECT repo, path, seq, metric FROM w
        """,
        "language_id_documents": _language_id_oracle_sql(),
        "doc_quality": _doc_quality_oracle_sql(),
        "doc_scrub": _doc_scrub_oracle_sql(),
        "doc_quality_filter": r"""
            WITH m AS (
                SELECT lang,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
                       greatest(length(text), 1) AS n_chars,
                       length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct,
                       length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit
                FROM documents
            )
            SELECT lang, COUNT(*) AS n_docs FROM m
            WHERE n_tokens >= 10
              AND CAST(n_punct AS DOUBLE) / n_chars <= 0.2
              AND CAST(n_digit AS DOUBLE) / n_chars <= 0.3
            GROUP BY lang
        """,
    }
    # the Iceberg export->spec-read loop must reproduce the lake state
    # byte-for-byte, so its oracle IS cdc_replay_mini's plain LWW — any
    # divergence is spec drift in the writer or the reader
    oracles["iceberg_round_trip"] = oracles["cdc_replay_mini"]
    # the MOR shape (delta levels + per-level equality deletes, exported
    # without compaction) must resolve to the SAME LWW state
    oracles["iceberg_round_trip_mor"] = oracles["cdc_replay_mini"]
    # landing-zone tail: events land in an append-only Iceberg table and
    # the replay tails it — the stream's content is identical, so the
    # LWW endpoint is identical
    oracles["iceberg_landing_tail"] = oracles["cdc_replay_mini"]
    # compaction loop: a replace snapshot + expiry changes no logical
    # content, so the LWW endpoint is again identical
    oracles["iceberg_compaction_loop"] = oracles["cdc_replay_mini"]
    return oracles


if __name__ == "__main__":
    from arc_spark.session import get_spark

    spark = get_spark("entry-smoke")
    df = entry(spark)
    df.show(5)
    print("rows:", df.count())
