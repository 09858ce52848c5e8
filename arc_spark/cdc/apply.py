"""The CDC apply kernel: content normalization + sha256 fingerprinting
(Arrow-vectorized) and last-writer-wins dedup per key.

Reference parity: the reference has no native dedup operator — SURVEY.md
§2.5 maps its SQL-first answer to ``Window.partitionBy(keys).orderBy(desc
seq)`` + ``row_number()==1`` or ``repartition(keys)+sortWithinPartitions+
mapPartitions`` (the shape BASELINE.json's north_rule mandates). We
implement three interchangeable strategies and verify they agree:

``thin``    (default)   thin (keys, seq) max-aggregate + explicit-broadcast
    null-safe semi join back (late materialization). The winner set is
    computed over ONLY the key/seq columns — Parquet column pruning means
    the thin pass never reads the multi-KB content from disk — and with
    ``broadcast_winners="auto"`` the join-back broadcasts the winner set,
    so the fat rows NEVER cross the wire at all. Measured (2M events, 2
    epochs, interleaved best-of-2): 179 MB total replay shuffle vs
    window's 422 MB (2.36x fewer bytes), throughput equal-or-better in
    every paired sample (155.7k vs 151.6k ev/s at local[8], 144.6k vs
    141.3k at local[32]). Fewer bus bytes is also the scaling lever on
    membw-ceilinged hosts (see BASELINE.md's strong-scaling closure).
    REQUIRES unique (keys, seq) — verbatim duplicate rows both survive
    the semi join; at-least-once sources must run
    :func:`collapse_redelivered` first (the debezium paths do, by
    default).

``window``              row_number over (partitionBy keys, orderBy seq desc).
    This IS the north_rule's repartition-by-key + sortWithinPartitions +
    LWW shape, and Spark ≥3.5 executes it with a WindowGroupLimit: each
    map task keeps only its local top-1 row per key BEFORE the shuffle,
    so like max_by only ~min(E, K·P) rows cross the wire — but every
    surviving row's full payload still crosses it. Duplicate-safe (ties
    collapse to one row) — the right choice when (keys, seq) uniqueness
    cannot be guaranteed and a pre-collapse is unwanted.

``thin_window``         window over (keys, seq) only + null-safe semi join back.
    Cuts the window exchange to thin rows; superseded by ``thin`` (same
    late-materialization idea, but the max-aggregate needs no sort).
    Kept for A/B and low-memory deployments.

``max_by``              groupBy(keys).agg(max_by(struct(*), seq)).
    Partial aggregation collapses local events per key map-side, but the
    hash-agg state holds one full multi-KB payload struct per key and
    spills once keys-per-task × row size exceeds task memory — and more
    tasks per host = less memory per task, so it anti-scales on fat rows.

``sort_partitions``     repartition(P, keys) → sortWithinPartitions(keys,
    seq desc) → stateful mapInPandas keep-first-per-key.
    The north_rule shape: all events for a key land in one partition,
    sorted so the winner is the first row of each key run; an Arrow batch
    iterator drops the rest while carrying the last key across batch
    boundaries (no per-row Python).

All strategies produce identical output when (keys, seq) is unique (the
native generator's invariant). At-least-once sources (Debezium) collapse
verbatim re-deliveries first via :func:`collapse_redelivered`.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# ---------------------------------------------------------------------------
# Normalization + fingerprint (vectorized; no per-row Python)
# ---------------------------------------------------------------------------


@pandas_udf(StringType())
def normalize_content(s: pd.Series) -> pd.Series:
    """Normalize source text: strip trailing whitespace per line, normalize
    line endings, drop trailing newlines. Vectorized pandas string ops over
    Arrow batches (north_rule: no per-row Python in the engine hot path).

    Whitespace is the EXPLICIT ASCII class [ \\t\\r\\n\\f\\v] — never ``\\s``,
    whose meaning differs across Python re (Unicode), Java regex (ASCII)
    and RE2/DuckDB (ASCII): the explicit class keeps the Arrow kernel, the
    codegen twin (normalize_and_fingerprint impl="jvm"), the Python
    reference replay and the DuckDB oracle bit-identical on any input.
    Unicode spaces (NBSP etc.) are treated as content, not formatting."""
    out = s.str.replace("\r\n", "\n", regex=False)
    out = out.str.replace(r"[ \t]+\n", "\n", regex=True)
    out = out.str.replace(r"[ \t\r\n\f\v]+$", "", regex=True)
    return out


@pandas_udf(StringType())
def sha256_hex(s: pd.Series) -> pd.Series:
    """sha256 hex digest of a string column (Arrow-batched).

    hashlib releases the GIL for large buffers; per-batch overhead is
    amortized by Arrow transfer. (For the engine hot path prefer
    ``normalize_and_fingerprint`` — its default mapInArrow kernel skips
    the pandas conversion entirely, and bench.py A/Bs all three impls.)
    """
    return s.map(lambda x: None if x is None else hashlib.sha256(x.encode("utf-8")).hexdigest())


from pyspark.sql.types import StructField, StructType


@pandas_udf(StructType([
    StructField("content", StringType(), True),
    StructField("content_sha256", StringType(), True),
]))
def _normalize_sha(s: pd.Series) -> pd.DataFrame:
    """Fused normalize+sha256 — ONE Arrow round trip instead of two chained
    UDFs (chaining would ship the multi-KB content column through Python
    twice)."""
    out = s.str.replace("\r\n", "\n", regex=False)
    out = out.str.replace(r"[ \t]+\n", "\n", regex=True)
    out = out.str.replace(r"[ \t\r\n\f\v]+$", "", regex=True)
    sha = out.map(
        lambda x: None if x is None else hashlib.sha256(x.encode("utf-8")).hexdigest()
    )
    return pd.DataFrame({"content": out, "content_sha256": sha})


def _normalize_sha_record_batches(batches, content_idx: int):
    """mapInArrow kernel: normalize + sha256 one RecordBatch at a time.

    All string work happens in Arrow's C++ kernels (RE2 regex — our
    normalization classes are explicitly ASCII, so RE2/Java/Python regex
    agree, see normalize_content) and the sha256 loop reads ZERO-COPY
    memoryview slices of the utf8 data buffer — no pandas object Series,
    no Python str materialization of multi-KB contents. hashlib releases
    the GIL on large buffers.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        if batch.num_rows == 0:
            # empty batch: buffers may be None — append an empty sha column
            yield pa.RecordBatch.from_arrays(
                list(batch.columns) + [pa.array([], type=pa.string())],
                names=list(batch.schema.names) + ["content_sha256"],
            )
            continue
        arr = batch.column(content_idx)
        arr = pc.replace_substring(arr, pattern="\r\n", replacement="\n")
        arr = pc.replace_substring_regex(arr, pattern="[ \t]+\n", replacement="\n")
        arr = pc.replace_substring_regex(arr, pattern="[ \t\r\n\f\x0b]+$", replacement="")
        if arr.type == pa.large_string():
            offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=len(arr) + 1)
        else:
            arr = arr.cast(pa.string())
            offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32, count=len(arr) + 1)
        data = memoryview(arr.buffers()[2] or b"")
        off0 = arr.offset
        null_mask = (
            np.asarray(arr.is_null()) if arr.null_count else None
        )
        shas: list[str | None] = []
        for i in range(len(arr)):
            if null_mask is not None and null_mask[i]:
                shas.append(None)
                continue
            lo, hi = offsets[off0 + i], offsets[off0 + i + 1]
            shas.append(hashlib.sha256(data[lo:hi]).hexdigest())
        cols = list(batch.columns)
        cols[content_idx] = arr
        cols.append(pa.array(shas, type=pa.string()))
        names = list(batch.schema.names) + ["content_sha256"]
        yield pa.RecordBatch.from_arrays(cols, names=names)


def normalize_and_fingerprint(
    df: DataFrame, content_col: str = "content", impl: str = "arrow"
) -> DataFrame:
    """Add ``content`` (normalized in place) and ``content_sha256``.

    ``impl`` — all three produce byte-identical output (equality pinned in
    test_cdc_end_to_end; A/B-able per-level in bench.py ab_kernels):
      - ``arrow`` (default): mapInArrow kernel — normalization in Arrow's
        RE2 C++ kernels, sha256 over zero-copy buffer slices. ONE Arrow
        round trip, no pandas conversion; the north_rule's
        vectorized-Arrow-UDF engine primitive at its fastest.
      - ``pandas``: the fused pandas-UDF kernel (pandas str ops + per-row
        hashlib). Slower: every content materializes as a Python str.
      - ``jvm``: a ``regexp_replace`` chain + ``F.sha2(_, 256)`` — stays
        entirely inside whole-stage codegen, no Python transfer at all.
    """
    if impl == "arrow":
        if "content_sha256" in df.columns:
            df = df.drop("content_sha256")
        cols = df.columns
        idx = cols.index(content_col)
        from pyspark.sql.types import StringType as _St
        from pyspark.sql.types import StructField as _Sf
        from pyspark.sql.types import StructType as _Stt

        out_schema = _Stt(
            list(df.schema.fields) + [_Sf("content_sha256", _St(), True)]
        )
        return df.mapInArrow(
            lambda it: _normalize_sha_record_batches(it, idx), schema=out_schema
        )
    if impl == "jvm":
        norm = F.regexp_replace(F.col(content_col), r"\r\n", "\n")
        norm = F.regexp_replace(norm, r"[ \t]+\n", "\n")
        norm = F.regexp_replace(norm, r"[ \t\r\n\f\x0B]+$", "")
        other = [c for c in df.columns if c != content_col]
        return df.withColumn("_nc", norm).select(
            *other,
            F.col("_nc").alias(content_col),
            F.when(
                F.col("_nc").isNotNull(), F.sha2(F.col("_nc"), 256)
            ).alias("content_sha256"),
        )
    if impl != "pandas":
        raise ValueError(f"impl must be 'arrow', 'pandas' or 'jvm', got {impl!r}")
    packed = F.when(F.col(content_col).isNotNull(), _normalize_sha(F.col(content_col)))
    other = [c for c in df.columns if c != content_col]
    return df.withColumn("_ns", packed).select(
        *other,
        F.col(f"_ns.{content_col}").alias(content_col),
        F.col("_ns.content_sha256").alias("content_sha256"),
    )


# ---------------------------------------------------------------------------
# Last-writer-wins dedup
# ---------------------------------------------------------------------------


# Winner sets up to this many rows broadcast in the thin strategies'
# join-back ("auto" mode). ~1M (key, seq) rows ≈ 100-200 MB of hash
# relation per executor — inside a normal 4-8 GB executor budget; above
# it the join falls back to AQE's shuffle/broadcast decision.
DEFAULT_MAX_BROADCAST_WINNERS = 1_000_000


def last_writer_wins(
    df: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    *,
    strategy: str = "thin",
    num_partitions: int | None = None,
    salt_buckets: int | None = None,
    broadcast_winners: bool | str = "auto",
    max_broadcast_winners: int = DEFAULT_MAX_BROADCAST_WINNERS,
) -> DataFrame:
    """Collapse ``df`` to one row per ``keys`` — the row with max ``seq_col``.

    ``salt_buckets`` (max_by/thin): explicit two-phase aggregation for hot
    keys — phase 1 groups by (keys, pmod(xxhash64(seq), S)) so a hot key's
    events split across S reducers, phase 2 merges the S finalists.
    The ``window`` strategy needs no salt: its partial WindowGroupLimit
    already collapses every key to ≤1 row per MAP task, so a hot key
    reaches the reducer with at most P rows (P = upstream partitions) —
    the pathological single-key-dominates-a-reducer case cannot occur.

    ``broadcast_winners`` (thin / thin_window only) controls the
    join-back build side: ``True`` = always ``F.broadcast(winners)``,
    ``False`` = leave it to AQE, ``"auto"`` (default) = count the winner
    set (one thin, column-pruned job) and broadcast iff ≤
    ``max_broadcast_winners``. Measured (2M events, 2 epochs): relying
    on AQE the semi join ran as SMJ and the replay shuffled 656 MB;
    explicit broadcast cut it to 156 MB vs window's 438 MB — the fat
    rows never cross the wire at all.
    """
    if strategy == "max_by":
        return _lww_max_by(df, keys, seq_col, salt_buckets)
    if strategy == "thin":
        return _lww_thin(
            df, keys, seq_col, salt_buckets,
            broadcast=broadcast_winners, max_broadcast=max_broadcast_winners,
        )
    if strategy == "window":
        return _lww_window(df, keys, seq_col)
    if strategy == "thin_window":
        return _lww_thin_window(
            df, keys, seq_col,
            broadcast=broadcast_winners, max_broadcast=max_broadcast_winners,
        )
    if strategy == "sort_partitions":
        return _lww_sort_partitions(df, keys, seq_col, num_partitions)
    raise ValueError(f"unknown LWW strategy: {strategy!r}")


def _lww_semi_join_back(
    df: DataFrame,
    winners: DataFrame,
    keys: list[str],
    seq_col: str,
    broadcast: bool | str = False,
    max_broadcast: int = DEFAULT_MAX_BROADCAST_WINNERS,
) -> DataFrame:
    """Null-safe LEFT SEMI join of the full rows onto the winning
    (keys, seq) set. A null-unsafe join would silently drop NULL-keyed
    rows, while max_by/window keep them as a group — every strategy must
    produce identical output.

    ``broadcast="auto"`` counts the winner set first: the count job reads
    only the thin (keys, seq) projection (Parquet column pruning), and a
    winner set under ``max_broadcast`` rows is broadcast explicitly —
    AQE alone was measured leaving this join as SMJ (the pre-shuffle
    size estimate of an aggregate output is not trusted for the
    conversion), which re-shuffles every fat row and erases the whole
    point of late materialization.

    The winner set is ``localCheckpoint(eager=True)``-materialized before
    the count: previously the thin aggregation ran TWICE per epoch (once
    for the count job, once again when the broadcast relation was built),
    i.e. two full column-pruned scans of the batch. The checkpoint runs
    it once; the count and the broadcast build both read the cached thin
    rows, and the RDD cache is ContextCleaner-managed (freed when the
    epoch's plan is garbage-collected), so nothing leaks across epochs.
    Availability trade-off: checkpoint blocks are unreplicated, so losing
    an executor between the checkpoint and its last read fails the epoch
    job instead of recomputing — the epoch is exactly-once-fenced, so a
    rerun resumes cleanly, and the exposure window is the seconds between
    the winner materialization and the merge commit."""
    if broadcast == "auto":
        winners = winners.localCheckpoint(eager=True)
        broadcast = winners.count() <= max_broadcast
    return _key_seq_join(df, winners, keys, seq_col, "left_semi", broadcast)


def _key_seq_join(
    df: DataFrame,
    other: DataFrame,
    keys: list[str],
    seq_col: str,
    how: str,
    broadcast: bool,
) -> DataFrame:
    """Null-safe semi/anti join of full rows onto a thin (keys, seq) set."""
    if broadcast:
        other = F.broadcast(other)
    d, w = df.alias("_d"), other.alias("_w")
    cond = None
    for k in [*keys, seq_col]:
        c = F.col(f"_d.{k}").eqNullSafe(F.col(f"_w.{k}"))
        cond = c if cond is None else (cond & c)
    return d.join(w, cond, how)


def collapse_redelivered(
    df: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    *,
    max_broadcast: int = DEFAULT_MAX_BROADCAST_WINNERS,
) -> tuple[DataFrame, int]:
    """Collapse at-least-once redelivery: keep ONE row per (keys, seq).

    The LWW strategies assume a unique seq per key (the native generator
    guarantees it); a Debezium tail does NOT — the connector's contract is
    at-least-once, so a restart can re-emit the same change event
    verbatim (same LSN → same seq), and the ``thin`` strategy's semi
    join-back would keep every verbatim copy, handing the lake MERGE two
    rows for one key (its full-outer join then duplicates the key in the
    table — the same reason Delta's MERGE errors on multi-matching
    sources). ``seq`` may also collide across DIFFERENT keys when the
    derivation falls back to ``ts_ms`` (debezium._default_seq) — those
    rows are distinct events and must survive, which is why the group key
    here is (keys, seq), never seq alone.

    Pay-for-use design (the 100 TB shape): detection is one THIN aggregate
    over only (keys, seq) — Parquet column pruning means a staged tail
    never reads the content column for this pass — and when the batch is
    clean (the overwhelmingly common case) the fat rows are untouched: no
    shuffle, no second pass. Only when duplicates exist does the fix run,
    and it is scoped to the affected groups: a broadcast anti/semi split
    isolates the few duplicated (keys, seq) groups, a row_number window
    collapses just those rows, and the clean remainder streams through
    unshuffled. The full ``dropDuplicates`` shuffle happens only in the
    pathological case of > ``max_broadcast`` duplicated groups.

    Returns ``(collapsed_df, extra_rows_dropped)`` — the count feeds the
    per-epoch ``events_redelivered`` metric.
    """
    from pyspark.sql.window import Window

    thin = df.select(*keys, F.col(seq_col))
    groups = (
        thin.groupBy(*keys, seq_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
    )
    stats = groups.agg(
        F.count(F.lit(1)).alias("_groups"),
        F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("_extras"),
    ).first()
    n_groups, n_extras = int(stats["_groups"]), int(stats["_extras"])
    if n_groups == 0:
        return df, 0
    if n_groups > max_broadcast:
        # pathological flood of duplicates: one full shuffle beats
        # broadcasting a huge dup set to every task
        return df.dropDuplicates([*keys, seq_col]), n_extras
    dup_keys = groups.drop("_n")
    clean = _key_seq_join(df, dup_keys, keys, seq_col, "left_anti", True)
    affected = _key_seq_join(df, dup_keys, keys, seq_col, "left_semi", True)
    w = Window.partitionBy(*[F.col(k) for k in keys], F.col(seq_col)).orderBy(
        F.col(seq_col)
    )
    fixed = (
        affected.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return clean.unionByName(fixed), n_extras


def lww_thin_collapse_redelivered(
    df: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    *,
    max_broadcast: int = DEFAULT_MAX_BROADCAST_WINNERS,
) -> tuple[DataFrame, int]:
    """Fused ``collapse_redelivered`` + thin LWW for at-least-once tails.

    The runner previously ran TWO full thin scans per epoch on
    iceberg/debezium tails: one (keys, seq) aggregate to detect verbatim
    re-deliveries, then the LWW winner aggregate. One grouped aggregate
    answers both: per key, ``count(*) == count_distinct(seq)`` iff no
    (keys, seq) group is duplicated (count_distinct ignores NULL seqs, so
    a null-seq row also fails the equality and takes the safe path), and
    ``max(seq)`` is already the LWW winner. On the clean path (the
    overwhelmingly common case) the fat rows join back against that
    winner set directly — identical output to collapse-then-LWW, one
    thin scan instead of two. Duplicates fall back to the exact
    collapse + plain thin LWW (rare, and the fallback recomputes the
    redelivered count exactly).

    Returns ``(deduped_df, events_redelivered)``.
    """
    thin = df.select(*keys, F.col(seq_col))
    stats = thin.groupBy(*keys).agg(
        F.max(seq_col).alias(seq_col),
        F.count(F.lit(1)).alias("_nr"),
        F.count_distinct(F.col(seq_col)).alias("_nd"),
    ).localCheckpoint(eager=True)
    extras_row = stats.agg(
        F.coalesce(F.sum(F.col("_nr") - F.col("_nd")), F.lit(0)).alias("_e")
    ).first()
    if int(extras_row["_e"]) != 0:
        collapsed, extras = collapse_redelivered(
            df, keys, seq_col, max_broadcast=max_broadcast
        )
        return (
            last_writer_wins(collapsed, keys, seq_col, strategy="thin"),
            extras,
        )
    winners = stats.select(*keys, F.col(seq_col))
    broadcast = stats.count() <= max_broadcast
    return _key_seq_join(df, winners, keys, seq_col, "left_semi", broadcast), 0


def _lww_thin(
    df: DataFrame,
    keys: list[str],
    seq_col: str,
    salt_buckets: int | None,
    broadcast: bool | str = "auto",
    max_broadcast: int = DEFAULT_MAX_BROADCAST_WINNERS,
) -> DataFrame:
    """Late-materialization LWW — the scale default.

    ``max_by(struct(*))`` drags the full payload (content ~KBs/row) through
    the aggregation: partial-agg hash state holds one fat struct per key,
    which spills once keys-per-partition × row-size exceeds task memory —
    and MORE tasks per host = LESS memory per task, so it anti-scales.

    Instead: (1) aggregate max(seq) over ONLY (keys, seq) — Parquet column
    pruning means the thin pass doesn't even read the payload columns from
    disk; per-key state is a single long. (2) semi-join the winning
    (keys, seq) set back onto the full rows — AQE turns this into a
    broadcast semi join whenever the winner set is small, making the fat
    side shuffle-free.
    """
    thin = df.select(*keys, F.col(seq_col))
    if salt_buckets and salt_buckets > 1:
        salt = F.pmod(F.xxhash64(F.col(seq_col)), F.lit(salt_buckets)).alias("_salt")
        winners = (
            thin.groupBy(*keys, salt)
            .agg(F.max(seq_col).alias(seq_col))
            .groupBy(*keys)
            .agg(F.max(seq_col).alias(seq_col))
        )
    else:
        winners = thin.groupBy(*keys).agg(F.max(seq_col).alias(seq_col))
    return _lww_semi_join_back(df, winners, keys, seq_col, broadcast, max_broadcast)


def _lww_max_by(df: DataFrame, keys: list[str], seq_col: str, salt_buckets: int | None) -> DataFrame:
    payload = [c for c in df.columns if c not in keys]
    packed = F.struct(*[F.col(c) for c in payload]).alias("_w")
    if salt_buckets and salt_buckets > 1:
        salt = F.pmod(F.xxhash64(F.col(seq_col)), F.lit(salt_buckets)).alias("_salt")
        phase1 = df.groupBy(*keys, salt).agg(F.max_by(packed, F.col(seq_col)).alias("_w"))
        phase2 = phase1.groupBy(*keys).agg(
            F.max_by(F.col("_w"), F.col(f"_w.{seq_col}")).alias("_w")
        )
        out = phase2
    else:
        out = df.groupBy(*keys).agg(F.max_by(packed, F.col(seq_col)).alias("_w"))
    return out.select(*keys, *[F.col(f"_w.{c}").alias(c) for c in payload])


def _lww_window(df: DataFrame, keys: list[str], seq_col: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _lww_thin_window(
    df: DataFrame,
    keys: list[str],
    seq_col: str,
    broadcast: bool | str = "auto",
    max_broadcast: int = DEFAULT_MAX_BROADCAST_WINNERS,
) -> DataFrame:
    """Window LWW over ONLY (keys, seq), then null-safe semi join back.

    ``window`` shuffles the surviving FULL rows (≤1 per key per map task,
    but each multi-KB); here the window's exchange carries thin
    (keys, seq) rows — a fraction of the bytes — and the fat rows never
    shuffle at all (AQE broadcast semi join). The tradeoff is a second
    pass over the source batch for the join-back; callers that persist
    the batch (ReplayRunner does) pay ~nothing for it."""
    from pyspark.sql.window import Window

    thin = df.select(*keys, seq_col)
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    winners = (
        thin.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return _lww_semi_join_back(df, winners, keys, seq_col, broadcast, max_broadcast)


def _lww_sort_partitions(
    df: DataFrame, keys: list[str], seq_col: str, num_partitions: int | None
) -> DataFrame:
    cols = df.columns
    key_idx = [cols.index(k) for k in keys]

    def _key_tuple(row) -> tuple:
        # normalize nulls so cross-batch comparison matches the mask below
        return tuple(None if pd.isna(v) else v for v in row)

    def drop_dupes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Rows arrive sorted by (keys, seq desc) within the partition; keep
        # the first row of each key run, carrying the last-seen key across
        # Arrow batch boundaries.
        prev_key: tuple | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            keymat = pdf.iloc[:, key_idx]
            # boundary mask: row differs from the previous row's key.
            # NULL keys group like every other strategy's (window/max_by
            # treat nulls as one group): a bare `!=` calls NaN != NaN True
            # — Arrow hands nullable ints to pandas as float NaN — and a
            # null-keyed run would then never collapse, so mask out the
            # both-null case explicitly.
            shifted = keymat.shift(1)
            firsts = (keymat.ne(shifted) & ~(keymat.isna() & shifted.isna())).any(axis=1)
            firsts.iloc[0] = True
            if prev_key is not None and _key_tuple(keymat.iloc[0]) == prev_key:
                firsts.iloc[0] = False
            prev_key = _key_tuple(keymat.iloc[-1])
            out = pdf[firsts.values]
            if not out.empty:
                yield out

    part = df.repartition(num_partitions, *keys) if num_partitions else df.repartition(*keys)
    ordered = part.sortWithinPartitions(*keys, F.col(seq_col).desc())
    return ordered.mapInPandas(drop_dupes, schema=df.schema)


# ---------------------------------------------------------------------------
# SCD Type 2: change stream -> full version history
# ---------------------------------------------------------------------------


def apply_scd2(
    df: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    *,
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2: derive the full version history
    from a change stream instead of collapsing to latest state (the LWW
    strategies above are SCD Type 1).

    Output = one row per surviving version with
      ``valid_from_seq``  the event's own seq,
      ``valid_to_seq``    the NEXT event's seq for the key (NULL = open),
      ``is_current``      open interval (the key's live version).

    A delete event closes its predecessor's interval (its seq becomes the
    predecessor's ``valid_to_seq``) and emits no row of its own — after a
    delete the key simply has no current version, matching the LWW
    tombstone semantics of :meth:`LakeTable.merge`.

    Scale shape: ONE shuffle of the stream by key (the lead() window).
    Unlike LWW, late materialization buys nothing here — every non-delete
    event survives into the output, so a thin-window + join-back variant
    would still move every fat row once AND pay a second pass; the plain
    window IS minimal data movement. Spark executes lead() with a
    spillable sort per key group, so hot keys degrade to disk sort, never
    OOM. Expect output ≈ input rows: SCD2 is a history TABLE, typically
    written once per epoch window, not a per-key rollup.

    The reference has no history operator (its SQL-first answer would be
    this same LEAD window in a SQLTransform — SURVEY.md §2.5); provided
    as a first-class operator because CDC consumers routinely need
    as-of/history joins over the same tail the engine already ingests.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).asc())
    hist = df.filter(F.col(op_col) != "schema-change").withColumn(
        "valid_to_seq", F.lead(F.col(seq_col)).over(w)
    )
    return (
        hist.filter(F.col(op_col) != delete_op)
        .withColumn("valid_from_seq", F.col(seq_col))
        .withColumn("is_current", F.col("valid_to_seq").isNull())
    )
