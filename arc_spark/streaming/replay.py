"""Structured-Streaming CDC apply: binlog tail → micro-batch MERGE.

The streaming twin of arc_spark.cdc.runner.ReplayRunner: a file-tail
``readStream`` over the change-event directory, applied per micro-batch
through ``foreachBatch`` into the same LakeTable MERGE. Exactly-once
composes two idempotence layers:

- Spark's streaming checkpoint replays an uncommitted micro-batch with the
  SAME ``batch_id`` after a crash,
- the lake manifest's epoch fencing turns a replayed ``merge(epoch=
  batch_id)`` into a no-op if it already committed.

This is exactly the Iceberg/Delta ``foreachBatch + txn-id`` recipe, built
on our own manifest log. Reference parity: mode-switched streaming
extracts (``extract/ParquetExtract.scala:148``), watermark plumbing
(``config/ConfigUtils.scala:643-660``), streaming loads
(``load/ParquetLoad.scala:136-142``); the reference delegates offset
management entirely to Spark checkpoints (SURVEY.md §3.3) — so do we,
with the manifest as the second (transactional) layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arc_spark.cdc.apply import (
    collapse_redelivered,
    last_writer_wins,
    normalize_and_fingerprint,
)
from arc_spark.cdc.runner import KEYS
from arc_spark.lake.table import LakeTable


class StreamingReplay:
    def __init__(
        self,
        spark: SparkSession,
        events_path: str,
        table: LakeTable,
        *,
        checkpoint_dir: str,
        strategy: str = "thin",
        fingerprint: bool = True,
        max_files_per_trigger: int | None = None,
        watermark: tuple[str, str] | None = None,  # (eventTime col, delay)
        merge_mode: str = "auto",
        on_bad: str = "error",
        quarantine_path: str | None = None,
        valid_ops: tuple[str, ...] = ("insert", "update", "delete", "schema-change"),
        metrics_path: str | None = None,
        events_format: str = "parquet",
        payload_schema=None,
        redelivery_dedup: bool | str = "auto",
        kafka_options: dict | None = None,
    ):
        self.spark = spark
        self.events_path = events_path
        self.table = table
        # "parquet" (default) tails staged change files; "debezium" tails
        # raw Debezium JSON envelopes and parses them inline
        # (arc_spark.cdc.debezium.parse_debezium — pure from_json codegen,
        # legal on a streaming frame). Unlike the batch runner there is NO
        # rescan penalty here: each micro-batch reads only its new files,
        # so inline parse is the natural home for a live connector tail.
        # "kafka" is the production Debezium wire: readStream.format
        # ("kafka") over the connector topic, value CAST to string, then
        # the IDENTICAL parse path as the file tail (_parse_envelopes) —
        # the file-format tests certify the kafka parse byte-for-byte;
        # only the source connector differs (requires the
        # spark-sql-kafka runtime jar on the cluster classpath).
        if events_format not in ("parquet", "debezium", "kafka"):
            raise ValueError(
                "events_format must be parquet/debezium/kafka, "
                f"got {events_format!r}"
            )
        if events_format in ("debezium", "kafka") and payload_schema is None:
            raise ValueError(
                f"events_format={events_format!r} requires payload_schema"
            )
        if events_format == "kafka":
            opts = kafka_options or {}
            if "kafka.bootstrap.servers" not in opts:
                raise ValueError(
                    "events_format='kafka' requires kafka_options with "
                    "'kafka.bootstrap.servers'"
                )
            if not any(
                k in opts for k in ("subscribe", "subscribePattern", "assign")
            ):
                raise ValueError(
                    "events_format='kafka' requires kafka_options with one "
                    "of subscribe/subscribePattern/assign"
                )
        self.kafka_options = kafka_options or {}
        self.events_format = events_format
        self.payload_schema = payload_schema
        self.checkpoint_dir = checkpoint_dir
        self.strategy = strategy
        self.fingerprint = fingerprint
        self.max_files_per_trigger = max_files_per_trigger
        self.watermark = watermark
        # micro-batches from a file tail are usually small vs the table —
        # exactly the merge-on-read regime (see LakeTable.merge)
        self.merge_mode = merge_mode
        # same malformed-event policy as ReplayRunner: error fails the
        # micro-batch before its merge commits; quarantine diverts bad
        # rows to {quarantine_path}/batch={id} (overwrite — idempotent on
        # Spark's micro-batch retry, same shape as the batch runner's
        # per-epoch dirs); ignore drops and counts
        if on_bad not in ("error", "quarantine", "ignore"):
            raise ValueError(
                f"on_bad must be error/quarantine/ignore, got {on_bad!r}"
            )
        if on_bad == "quarantine" and not quarantine_path:
            raise ValueError("on_bad='quarantine' requires quarantine_path")
        self.on_bad = on_bad
        self.quarantine_path = quarantine_path
        self.valid_ops = tuple(valid_ops)
        # batch-runner parity (ReplayRunner.metrics_path): persist the
        # per-micro-batch counter records so a long-running stream's
        # metrics survive a driver restart. One JSON line appended per
        # batch (any arc_spark.fs scheme).
        self.metrics_path = metrics_path
        # At-least-once redelivery collapse (apply.collapse_redelivered):
        # "auto" = on for debezium/kafka tails (the connector wire is
        # at-least-once), off for staged parquet (seq unique by
        # construction there). Batch-runner parity.
        if redelivery_dedup == "auto":
            redelivery_dedup = events_format in ("debezium", "kafka")
        self.redelivery_dedup = bool(redelivery_dedup)
        self.batches: list[dict] = []

    def _record(self, rec: dict) -> None:
        self.batches.append(rec)
        if self.metrics_path:
            import json

            from arc_spark.fs import get_fs

            # one appended line per batch — O(total records) bytes over
            # the stream's lifetime, and a restart naturally extends the
            # previous run's log. Backends without native append fall
            # back to read+rewrite inside open_append (documented cost on
            # object storage; point metrics at HDFS/local there).
            with get_fs(self.metrics_path, self.spark).open_append(
                self.metrics_path
            ) as out:
                out.write((json.dumps(rec) + "\n").encode())

    def _parse_envelopes(self, raw: DataFrame) -> DataFrame:
        """Debezium JSON envelopes (a string ``value`` column) → canonical
        change frame. ONE parse path for the file tail AND the kafka
        topic — pure from_json codegen, no executor Python."""
        from arc_spark.cdc.debezium import parse_debezium

        return parse_debezium(raw, self.payload_schema).drop("_ts_ms")

    def _stream(self) -> DataFrame:
        if self.events_format == "kafka":
            reader = self.spark.readStream.format("kafka")
            # earliest by default: a NEW checkpoint replays the topic from
            # the start (bootstrap semantics); an existing checkpoint's
            # stored offsets always win over this option
            opts = {"startingOffsets": "earliest", **self.kafka_options}
            for key, val in opts.items():
                reader = reader.option(key, str(val))
            raw = reader.load().select(
                F.col("value").cast("string").alias("value")
            )
            df = self._parse_envelopes(raw)
        elif self.events_format == "debezium":
            reader = self.spark.readStream
            if self.max_files_per_trigger:
                reader = reader.option(
                    "maxFilesPerTrigger", self.max_files_per_trigger
                )
            df = self._parse_envelopes(reader.text(self.events_path))
        else:
            # mergeSchema for the same reason as ReplayRunner._events:
            # later stream files may carry evolved columns earlier files
            # lack
            schema = (
                self.spark.read.option("mergeSchema", "true")
                .parquet(self.events_path)
                .schema
            )
            reader = self.spark.readStream.schema(schema)
            if self.max_files_per_trigger:
                reader = reader.option(
                    "maxFilesPerTrigger", self.max_files_per_trigger
                )
            df = reader.parquet(self.events_path)
        if self.watermark:
            df = df.withWatermark(*self.watermark)
        return df

    def _apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        # NO df.observe/Observation in this path. Inside foreachBatch the
        # micro-batch DataFrame is bound to a CLONED SparkSession; the
        # merge's write actions execute on the MAIN session (their plans
        # are rooted at the table's base read), so an Observation
        # registered via the batch frame waits on a listener bus the
        # write never posts to and Observation.get blocks FOREVER — it
        # only ever worked when the merge's bucket-pruning path happened
        # to run a discovery action directly on the clone-session frame.
        # Explicit aggregates are deterministic on any session: the read
        # counters fuse into the bounds job (one action, not two), and
        # the applied counters run over the persisted winner set, which
        # the merge then reuses instead of recomputing the dedup.
        bad = ~F.col("op").isin(*self.valid_ops)
        for k in [*KEYS, "seq"]:
            bad = bad | ((F.col("op") != "schema-change") & F.col(k).isNull())
        good_seq = F.when(~bad, F.col("seq"))
        stats = batch.agg(
            F.count(F.lit(1)).alias("events_read"),
            F.count_if(F.col("op") == "schema-change").alias("schema_changes"),
            F.count_if(bad).alias("events_bad"),
            F.min(good_seq).alias("lo"),
            F.max(good_seq).alias("hi"),
        ).first()
        if stats["events_bad"] and self.on_bad == "error":
            raise ValueError(
                f"batch {batch_id}: {stats['events_bad']} malformed change "
                f"event(s) (op outside {self.valid_ops} or NULL key/seq on "
                f"a row op); nothing committed — fix the stream and rerun, "
                f"or use on_bad='quarantine'/'ignore'"
            )
        if self.on_bad == "quarantine" and stats["events_bad"]:
            batch.filter(bad).write.mode("overwrite").parquet(
                f"{self.quarantine_path}/batch={batch_id}"
            )
        batch = batch.filter(~bad)
        if stats["lo"] is None:
            # nothing mergeable — but the batch may still have READ events
            # (e.g. every row was quarantined/ignored as malformed): emit
            # the counters instead of letting those events vanish
            if stats["events_read"]:
                self._record(
                    {"batch_id": batch_id, "status": "no_mergeable_events",
                     "events_read": stats["events_read"],
                     "schema_changes": stats["schema_changes"],
                     "events_bad": stats["events_bad"]}
                )
            return
        row_ops = batch.filter(F.col("op") != "schema-change")
        events_redelivered = 0
        if self.redelivery_dedup:
            row_ops, events_redelivered = collapse_redelivered(row_ops, KEYS, "seq")
        deduped = last_writer_wins(row_ops, KEYS, "seq", strategy=self.strategy)
        if self.fingerprint:
            deduped = normalize_and_fingerprint(deduped)
        from pyspark import StorageLevel

        deduped = deduped.persist(StorageLevel.MEMORY_AND_DISK_DESER)
        try:
            applied = deduped.agg(
                F.count(F.lit(1)).alias("keys_applied"),
                F.count_if(F.col("op") == "delete").alias("deletes"),
            ).first()
            result = self.table.merge(
                self.spark,
                deduped,
                epoch=batch_id,
                start_seq=int(stats["lo"]),
                end_seq=int(stats["hi"]),
                mode=self.merge_mode,
            )
        finally:
            deduped.unpersist()
        counters = {}
        if result.get("status") == "committed":
            counters = {
                "events_read": stats["events_read"],
                "schema_changes": stats["schema_changes"],
                "events_bad": stats["events_bad"],
                "keys_applied": applied["keys_applied"],
                "deletes": applied["deletes"],
            }
            counters["events_deduped"] = (
                counters["events_read"]
                - counters["schema_changes"]
                - counters["keys_applied"]
                - counters["events_bad"]
            )
            if self.redelivery_dedup:
                counters["events_redelivered"] = events_redelivered
        self._record({"batch_id": batch_id, **counters, **result})

    def start(self):
        """Start the streaming query; caller awaits/stops it."""
        return (
            self._stream()
            .writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def run_available(self) -> list[dict]:
        """Process everything currently in the directory, then stop."""
        q = self.start()
        q.awaitTermination()
        return self.batches
