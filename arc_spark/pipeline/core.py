"""Pipeline model + interpreter.

Reference parity: ``ARC.run`` walks stages in declared order, with
lifecycle before/after hooks, per-stage structured JSON enter/exit log
events with durations, and skip-all control-flow semantics
(``ARC.scala:433-508``; ControlFlow gate ``plugins/lifecycle/
ControlFlow.scala:56-95``). Stages communicate exclusively through Spark
temp views (``api/API.scala:298-314``): extracts/transforms register
``outputView``; loads/validates consume ``inputView``.

The interpreter is deliberately a thin driver-side loop: every stage
builds lazy DataFrame lineage and Spark work is only forced by loads,
validates, and persist counts — Catalyst sees the whole per-stage plan
("Spark may alter the order of evaluation once it has analyzed the DAG",
ARC.scala:423-432).
"""

from __future__ import annotations

import json
import logging
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger("arc_spark.pipeline")


@dataclass
class PipelineContext:
    spark: SparkSession
    environment: str = "production"
    args: dict[str, str] = field(default_factory=dict)
    streaming: bool = False
    lint: bool = False
    user_data: dict[str, Any] = field(default_factory=dict)
    lifecycle: list["LifecyclePlugin"] = field(default_factory=list)
    # accumulated per-stage metrics (duration, rows where cheap)
    events: list[dict] = field(default_factory=list)
    # execution policies (ARC.scala:57-74): persist storage level for
    # `persist: true` stages, and immutable views (a second registration
    # of the same view name is an error)
    storage_level: str = "MEMORY_AND_DISK_SER"
    immutable_views: bool = False
    registered_views: set = field(default_factory=set)


def _storage_level(ctx: PipelineContext):
    from pyspark import StorageLevel

    name = (ctx.storage_level or "MEMORY_AND_DISK_SER").upper()
    # pyspark has no *_SER levels (serialization is inherent); the
    # reference default MEMORY_AND_DISK_SER maps to MEMORY_AND_DISK
    name = {"MEMORY_AND_DISK_SER": "MEMORY_AND_DISK", "MEMORY_ONLY_SER": "MEMORY_ONLY"}.get(
        name, name
    )
    return getattr(StorageLevel, name, StorageLevel.MEMORY_AND_DISK)


class LifecyclePlugin:
    """before/after hooks around every stage (plugins/lifecycle/*)."""

    def run_stage(self, stage: "PipelineStage", ctx: PipelineContext) -> bool:
        """Return False to skip this and all remaining stages (the
        ControlFlow skip-all contract, ControlFlow.scala:56-95)."""
        return True

    def before(self, stage: "PipelineStage", ctx: PipelineContext) -> None:
        pass

    def after(
        self, stage: "PipelineStage", ctx: PipelineContext, df: DataFrame | None
    ) -> DataFrame | None:
        """May replace the stage's output DataFrame (ARC.scala:455-462)."""
        return df


class PipelineStage:
    stage_type: str = "AbstractStage"

    def __init__(
        self,
        name: str,
        description: str | None = None,
        environments: list[str] | None = None,
        **params: Any,
    ):
        self.name = name
        self.description = description
        self.environments = environments or []
        self.params = params

    def execute(self, ctx: PipelineContext) -> DataFrame | None:
        raise NotImplementedError

    # -- shared helpers -----------------------------------------------------

    def register_output(
        self, ctx: PipelineContext, df: DataFrame, output_view: str | None
    ) -> DataFrame:
        """Repartition / persist / createOrReplaceTempView plumbing shared by
        every extract+transform (extract/DelimitedExtract.scala:267-309)."""
        num_partitions = self.params.get("numPartitions")
        partition_by = self.params.get("partitionBy") or []
        if not df.isStreaming:
            if num_partitions and partition_by:
                df = df.repartition(int(num_partitions), *partition_by)
            elif num_partitions:
                df = df.repartition(int(num_partitions))
            elif partition_by:
                df = df.repartition(*partition_by)
        if output_view:
            if ctx.immutable_views and output_view in ctx.registered_views:
                raise ValueError(
                    f"{self.name}: view {output_view!r} is already registered and "
                    f"policy immutableViews is enabled (ARC.scala:66-70)"
                )
            df.createOrReplaceTempView(output_view)
            ctx.registered_views.add(output_view)
        if self.params.get("persist") and not df.isStreaming:
            ctx.spark.catalog.cacheTable(output_view, storageLevel=_storage_level(ctx))
            df.count()
        return df

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{self.stage_type} {self.name!r}>"


@dataclass
class ETLPipeline:
    stages: list[PipelineStage]

    def run(self, ctx: PipelineContext) -> DataFrame | None:
        """Interpret stages in order; returns the last stage's DataFrame."""
        last: DataFrame | None = None
        for i, stage in enumerate(self.stages):
            if stage.environments and ctx.environment not in stage.environments:
                _log_event(ctx, stage, i, "stage.skipped", 0.0, reason="environment")
                continue
            if not all(p.run_stage(stage, ctx) for p in ctx.lifecycle):
                _log_event(ctx, stage, i, "pipeline.skipRemaining", 0.0)
                break
            for p in ctx.lifecycle:
                p.before(stage, ctx)
            t0 = time.time()
            try:
                # per-stage cloud credentials reach the Hadoop conf before
                # the stage touches its URI (util/CloudUtils.scala:30-150,
                # applied by every reference extract/load)
                if stage.params.get("authentication"):
                    from arc_spark.auth import apply_authentication

                    applied = apply_authentication(
                        ctx.spark, stage.params["authentication"]
                    )
                    _log_event(
                        ctx, stage, i, "stage.authentication", 0.0,
                        keys=sorted(applied),  # keys only — never the secrets
                    )
                df = stage.execute(ctx)
            except Exception:
                _log_event(ctx, stage, i, "stage.failed", time.time() - t0)
                raise
            for p in ctx.lifecycle:
                replaced = p.after(stage, ctx, df)
                if replaced is not None:
                    df = replaced
            _log_event(ctx, stage, i, "stage.complete", time.time() - t0)
            if df is not None:
                last = df
        return last


def _log_event(
    ctx: PipelineContext,
    stage: PipelineStage,
    index: int,
    event: str,
    duration: float,
    **extra: Any,
) -> None:
    rec = {
        "event": event,
        "stage": stage.name,
        "type": stage.stage_type,
        "stageIndex": index,
        "duration_ms": int(duration * 1000),
        **extra,
    }
    ctx.events.append(rec)
    log.info(json.dumps(rec))
