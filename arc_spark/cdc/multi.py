"""Multi-table replay: one change stream → many lake tables, atomically.

A whole-database binlog tail interleaves events for every table the
connector captures; each event carries its table name (Debezium
``source.table``). :class:`MultiTableReplay` windows the GLOBAL seq into
epochs exactly like the single-table :class:`arc_spark.cdc.runner
.ReplayRunner`, routes each epoch's events by table, applies each
table's LWW merge, and publishes ALL of the epoch's table versions in
ONE :class:`arc_spark.lake.catalog.LakeCatalog` commit — so readers that
resolve tables through the catalog never observe table A at epoch k and
table B at epoch k-1.

Exactly-once across the set:
- Offsets (the shared stream's seq window) are fenced in the CATALOG
  manifest, not per table. Resume = catalog end_seq + 1.
- A crash after some table merges but before the catalog commit leaves
  readers on the previous consistent version-set; the rerun's table
  merges are fenced per-table no-ops and the catalog commit completes
  the epoch with the versions the crashed run already produced.

Scale notes:
- Routing is a per-table predicate over the epoch scan. On staged
  parquet both the seq band (row-group stats) and the table predicate
  push down; a tail staged with ``partitionBy(table)`` turns routing
  into directory pruning (zero waste). For multi-table epochs over
  non-partitioned input the epoch batch is persisted once
  (MEMORY_AND_DISK) so T tables cost one scan, not T.
- The per-table apply reuses the single-table kernels unchanged
  (thin LWW, Arrow fingerprint, salting) — the catalog adds only
  O(#tables) metadata per epoch.

Reference parity: the reference executes multi-output pipelines as one
config DAG with shared lineage (``ARC.scala:491-502``); routing by a
column echoes its PartitionLoad splitters, and the version-set commit is
the cross-table generalization of the manifest fencing in
arc_spark/lake/table.py.
"""

from __future__ import annotations

import json
import logging
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StringType, StructType

from arc_spark.cdc.apply import last_writer_wins, normalize_and_fingerprint
from arc_spark.lake.catalog import LakeCatalog

log = logging.getLogger("arc_spark.cdc.multi")


class MultiTableReplay:
    """Replay a table-tagged change stream into a LakeCatalog.

    ``events_path``: parquet change stream whose rows carry
    ``table_col`` (plus the canonical op/seq/key/payload columns), or a
    raw Debezium JSON tail (``events_format='debezium'``) where the
    routing key is ``source.table``.

    ``on_unknown_table``:
      - ``"error"`` (default): an event for an unregistered table fails
        the epoch before anything commits (exactly-once → fix, rerun).
      - ``"create"``: auto-register the table with the stream's schema
        (minus op/table columns, plus the fingerprint) — the bootstrap
        behavior of a whole-database connector.
      - ``"ignore"``: drop those events (counted in metrics).
    """

    def __init__(
        self,
        spark: SparkSession,
        events_path: str | list[str],
        catalog: LakeCatalog,
        *,
        table_col: str = "table",
        batch_size: int = 100_000,
        strategy: str = "thin",
        salt_buckets: int | None = None,
        fingerprint: bool | str = True,
        keys: list[str] | None = None,
        seq_col: str = "seq",
        merge_mode: str = "auto",
        metrics_path: str | None = None,
        on_unknown_table: str = "error",
        num_buckets: int = 32,
        events_format: str = "parquet",
        payload_schema=None,
    ):
        if events_format not in ("parquet", "debezium"):
            raise ValueError(
                f"events_format must be parquet/debezium, got {events_format!r}"
            )
        if events_format == "debezium" and payload_schema is None:
            raise ValueError("events_format='debezium' requires payload_schema")
        if on_unknown_table not in ("error", "create", "ignore"):
            raise ValueError(
                f"on_unknown_table must be error/create/ignore, got {on_unknown_table!r}"
            )
        self.spark = spark
        self.events_path = events_path
        self.catalog = catalog
        self.table_col = table_col
        self.batch_size = batch_size
        self.strategy = strategy
        self.salt_buckets = salt_buckets
        self.fingerprint = fingerprint
        self.keys = list(keys) if keys else ["repo", "path"]
        self.seq_col = seq_col
        self.merge_mode = merge_mode
        self.metrics_path = metrics_path
        self.on_unknown_table = on_unknown_table
        self.num_buckets = num_buckets
        self.events_format = events_format
        self.payload_schema = payload_schema
        self.metrics: list[dict] = []

    # ------------------------------------------------------------------

    def _events(self) -> DataFrame:
        paths = (
            list(self.events_path)
            if isinstance(self.events_path, (list, tuple))
            else [self.events_path]
        )
        if self.events_format == "debezium":
            from arc_spark.cdc.debezium import parse_debezium

            raw = self.spark.read.text(paths)
            return (
                parse_debezium(
                    raw, self.payload_schema, with_source_table=True
                )
                .drop("_ts_ms")
                .withColumnRenamed("_table", self.table_col)
            )
        return self.spark.read.option("mergeSchema", "true").parquet(*paths)

    def max_seq(self) -> int:
        row = self._events().agg(F.max(self.seq_col)).first()
        return -1 if row[0] is None else int(row[0])

    # ------------------------------------------------------------------

    def _table_schema_from(self, batch: DataFrame) -> StructType:
        fields = [
            f
            for f in batch.schema.fields
            if f.name not in ("op", self.table_col)
        ]
        if self.fingerprint and "content_sha256" not in {f.name for f in fields}:
            fields.append(StructField("content_sha256", StringType(), True))
        return StructType(fields)

    def run(
        self,
        *,
        max_epochs: int | None = None,
        end_seq: int | None = None,
        failure_injector: Callable[[int, str], None] | None = None,
    ) -> list[dict]:
        stream_end = self.max_seq() if end_seq is None else end_seq
        epochs_done = 0
        while True:
            snap = self.catalog.snapshot()
            next_seq = snap.end_seq + 1
            if next_seq > stream_end:
                break
            if max_epochs is not None and epochs_done >= max_epochs:
                break
            epoch = snap.epoch + 1
            batch_end = min(next_seq + self.batch_size - 1, stream_end)
            self.run_epoch(epoch, next_seq, batch_end, failure_injector)
            epochs_done += 1
        if self.metrics_path:
            from arc_spark.fs import get_fs

            get_fs(self.metrics_path, self.spark).write_bytes(
                self.metrics_path,
                "".join(json.dumps(m) + "\n" for m in self.metrics).encode(),
            )
        return self.metrics

    # ------------------------------------------------------------------

    def run_epoch(
        self,
        epoch: int,
        start_seq: int,
        end_seq: int,
        failure_injector: Callable[[int, str], None] | None = None,
    ) -> dict:
        t0 = time.time()
        tcol = F.col(self.table_col)
        batch = self._events().filter(
            (F.col(self.seq_col) >= start_seq) & (F.col(self.seq_col) <= end_seq)
        )
        # One driver-side pass over table names: O(#tables) rows — the
        # same order as the catalog manifest itself. The per-name event
        # counts ride along for free (metrics + empty-table skip).
        name_rows = (
            batch.groupBy(tcol.alias("_t"))
            .agg(F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        counts = {r["_t"]: r["_n"] for r in name_rows}
        if None in counts:
            raise ValueError(
                f"epoch {epoch}: {counts[None]} events with NULL "
                f"{self.table_col!r} — not routable"
            )
        snap = self.catalog.snapshot()
        known = set(snap.tables)
        names = sorted(counts)
        unknown = [n for n in names if n not in known]
        events_ignored = 0
        if unknown:
            if self.on_unknown_table == "error":
                raise KeyError(
                    f"epoch {epoch}: events for unregistered tables "
                    f"{unknown} (on_unknown_table='error')"
                )
            if self.on_unknown_table == "ignore":
                events_ignored = sum(counts[n] for n in unknown)
                names = [n for n in names if n in known]
            else:  # create
                schema = self._table_schema_from(batch)
                for n in unknown:
                    self.catalog.register(
                        n,
                        schema=schema,
                        key_cols=self.keys,
                        seq_col=self.seq_col,
                        num_buckets=self.num_buckets,
                    )

        # T tables would re-run the scan T times on unpartitioned input;
        # pin the epoch batch once. (A tail staged partitionBy(table)
        # makes this unnecessary — the filter prunes directories — but
        # persisting O(epoch) rows is always safe.)
        persisted = len(names) > 1
        if persisted:
            batch = batch.persist()
        try:
            table_versions: dict[str, int] = {}
            per_table: dict[str, dict] = {}
            for name in names:
                sub = batch.filter(tcol == name).drop(self.table_col)
                deduped = last_writer_wins(
                    sub.filter(F.col("op") != "schema-change"),
                    self.keys,
                    self.seq_col,
                    strategy=self.strategy,
                    salt_buckets=self.salt_buckets,
                )
                if self.fingerprint:
                    impl = (
                        self.fingerprint
                        if isinstance(self.fingerprint, str)
                        else "arrow"
                    )
                    deduped = normalize_and_fingerprint(deduped, impl=impl)
                table = self.catalog.table(name)
                if failure_injector:
                    failure_injector(epoch, f"before_merge:{name}")
                result = table.merge(
                    self.spark,
                    deduped,
                    epoch=epoch,
                    start_seq=start_seq,
                    end_seq=end_seq,
                    mode=self.merge_mode,
                )
                # fenced retry returns no version — the table's current
                # version already contains this epoch
                table_versions[name] = int(
                    result.get("version", table.current_version())
                )
                per_table[name] = {
                    "events_read": counts[name],
                    "status": result.get("status"),
                    "rows_written": result.get("rows_written"),
                }
            if failure_injector:
                failure_injector(epoch, "before_catalog_commit")
            commit = self.catalog.commit_epoch(
                epoch,
                start_seq=start_seq,
                end_seq=end_seq,
                table_versions=table_versions,
                counters={
                    "events_read": sum(counts[n] for n in names),
                    "events_ignored": events_ignored,
                },
            )
        finally:
            if persisted:
                batch.unpersist()

        metric = {
            "event": "epoch.complete",
            "epoch": epoch,
            "start_seq": start_seq,
            "end_seq": end_seq,
            "duration_sec": round(time.time() - t0, 3),
            "status": commit.get("status"),
            "catalog_version": commit.get("version"),
            "tables": per_table,
            "events_ignored": events_ignored,
        }
        self.metrics.append(metric)
        log.info(json.dumps(metric))
        return metric


def bootstrap_catalog_for_stream(
    spark: SparkSession,
    events_path: str | list[str],
    catalog_root: str,
    *,
    table_col: str = "table",
    keys: list[str] = ("repo", "path"),
    seq_col: str = "seq",
    num_buckets: int = 32,
    fingerprint: bool = True,
    locker=None,
    overwrite: bool = True,
    events_format: str = "parquet",
    payload_schema=None,
) -> LakeCatalog:
    """Create a catalog with one table per distinct ``table_col`` value
    in the stream — the whole-database connector bootstrap. Each table's
    schema is the stream schema minus op/table (plus the fingerprint);
    per-table schema divergence is handled later by merge widening."""
    catalog = LakeCatalog(catalog_root, locker=locker)
    catalog.create(overwrite=overwrite)
    replay = MultiTableReplay(
        spark,
        events_path,
        catalog,
        table_col=table_col,
        keys=list(keys),
        seq_col=seq_col,
        num_buckets=num_buckets,
        fingerprint=fingerprint,
        events_format=events_format,
        payload_schema=payload_schema,
    )
    ev = replay._events()
    names = [
        r["_t"]
        for r in ev.select(F.col(table_col).alias("_t")).distinct().collect()
        if r["_t"] is not None
    ]
    schema = replay._table_schema_from(ev)
    for n in sorted(names):
        catalog.register(
            n,
            schema=schema,
            key_cols=list(keys),
            seq_col=seq_col,
            num_buckets=num_buckets,
        )
    return catalog
