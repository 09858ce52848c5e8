from arc_spark.pipeline.core import (  # noqa: F401
    ETLPipeline,
    LifecyclePlugin,
    PipelineContext,
    PipelineStage,
)
from arc_spark.pipeline.config import ConfigError, parse_pipeline, run_config  # noqa: F401
