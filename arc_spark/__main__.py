"""``spark-submit --py-files arc_spark.zip -m arc_spark`` / ``python -m
arc_spark`` entry point — the reference's ``ai.tripl.arc.ARC`` main
(``ARC.scala:30-142``).

Arguments are ``--key=value`` pairs; recognized control keys mirror the
reference (each also readable from its ETL_CONF_* environment variable):

    --etl.config.uri=job.conf            job file (.json/.conf/.ipynb;
                                         file/http(s)/classpath URIs)
    --etl.config.environment=production  environments filter
    --etl.config.lintOnly=true           parse+validate, don't execute
    --etl.config.streaming=true          streaming mode
    --etl.config.immutableViews=true     duplicate view registration errors
    --etl.config.storageLevel=MEMORY_AND_DISK_SER
    --etl.config.job.id=... / --etl.config.job.name=...

Every OTHER ``--key=value`` argument becomes a job parameter available to
``${key}`` substitution (commandLineArguments precedence,
``config/ArcPipeline.scala:68-85``). Exit code 0 on success, 1 with the
accumulated error list on config/validation failure (ARC.scala error
handling).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _env(name: str, default: str | None = None) -> str | None:
    return os.environ.get(name, default)

_CONTROL_KEYS = {
    "etl.config.uri", "etl.config.environment", "etl.config.lintOnly",
    "etl.config.streaming", "etl.config.immutableViews",
    "etl.config.storageLevel", "etl.config.job.id", "etl.config.job.name",
    "etl.config.master",
}


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    args: dict[str, str] = {}
    for a in argv:
        if not a.startswith("--") or "=" not in a:
            print(f"ignoring argument (expected --key=value): {a}", file=sys.stderr)
            continue
        k, v = a[2:].split("=", 1)
        args[k] = v

    uri = args.get("etl.config.uri") or _env("ETL_CONF_URI")
    if not uri:
        print(
            "No config defined as --etl.config.uri or ETL_CONF_URI", file=sys.stderr
        )
        return 1
    environment = args.get("etl.config.environment") or _env("ETL_CONF_ENV")
    if not environment:
        print(
            "No environment defined as --etl.config.environment or ETL_CONF_ENV",
            file=sys.stderr,
        )
        return 1
    lint = (args.get("etl.config.lintOnly") or _env("ETL_CONF_LINT_ONLY", "false")).lower() == "true"
    streaming = (args.get("etl.config.streaming") or _env("ETL_CONF_STREAMING", "false")).lower() == "true"
    immutable = (args.get("etl.config.immutableViews") or _env("ETL_CONF_IMMUTABLE_VIEWS", "false")).lower() == "true"
    storage = args.get("etl.config.storageLevel") or _env("ETL_CONF_STORAGE_LEVEL", "MEMORY_AND_DISK_SER")

    job_args = {k: v for k, v in args.items() if k not in _CONTROL_KEYS}

    from arc_spark.pipeline.config import ConfigError, run_config
    from arc_spark.session import get_spark

    # Route the engine's structured JSON log events (per-stage enter/exit,
    # per-epoch replay metrics incl. bucket lineage) to stderr alongside
    # the CLI's own events — Arc's structured-log surface (ARC.scala:491).
    import logging

    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter("%(message)s"))
    engine_log = logging.getLogger("arc_spark")
    engine_log.setLevel(logging.INFO)
    engine_log.addHandler(handler)

    spark = get_spark(
        args.get("etl.config.job.name", "arc-spark"),
        master=args.get("etl.config.master") or _env("ETL_CONF_MASTER") or "local[*]",
    )
    t0 = time.time()
    event = {
        "event": "enter",
        "config": uri,
        "environment": environment,
        "jobId": args.get("etl.config.job.id"),
        "jobName": args.get("etl.config.job.name"),
        "lintOnly": lint,
        "streaming": streaming,
    }
    print(json.dumps(event), file=sys.stderr)
    try:
        _, ctx = run_config(
            spark,
            uri,
            environment=environment,
            args=job_args,
            streaming=streaming,
            lint=lint,
            storage_level=storage,
            immutable_views=immutable,
        )
        if streaming and not lint:
            for q in ctx.user_data.get("streaming_queries", []):
                q.awaitTermination()
    except ConfigError as e:
        for err in e.errors:
            print(json.dumps({"event": "config.error", "error": err}), file=sys.stderr)
        return 1
    except Exception as e:
        print(json.dumps({"event": "job.failed", "error": str(e)}), file=sys.stderr)
        return 1
    print(
        json.dumps({"event": "exit", "status": "success", "duration": round(time.time() - t0, 3)}),
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
