"""`python -m arc_spark` entry point — the spark-submit main
(ARC.scala:30-142): --etl.config.uri job execution, lint mode, job
parameters via --key=value, error exit codes."""

from __future__ import annotations

import json
import subprocess
import sys


def _run(*argv: str, env_extra: dict | None = None) -> subprocess.CompletedProcess:
    import os

    env = {**os.environ, **(env_extra or {})}
    return subprocess.run(
        [sys.executable, "-m", "arc_spark", *argv],
        capture_output=True, text=True, timeout=240, cwd="/root/repo", env=env,
    )


def test_cli_runs_job_with_params(tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("id,v\n1,a\n2,b\n3,c\n")
    out = tmp_path / "out"
    conf = tmp_path / "job.conf"
    conf.write_text(
        """
        stages = [
          { type = DelimitedExtract, name = e, inputURI = ${input.path},
            outputView = raw, header = true, environments = ["production"] }
          { type = SQLTransform, name = t, outputView = filtered,
            sql = "SELECT id, v FROM raw WHERE id >= ${min.id}",
            environments = ["production"] }
          { type = ParquetLoad, name = w, inputView = filtered,
            outputURI = ${output.path}, environments = ["production"] }
        ]
        """
    )
    r = _run(
        f"--etl.config.uri={conf}",
        "--etl.config.environment=production",
        "--etl.config.master=local[4]",
        f"--input.path={src}",
        f"--output.path={out}",
        "--min.id=2",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import duckdb

    n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{out}/*.parquet')").fetchone()[0]
    assert n == 2
    events = [json.loads(line) for line in r.stderr.splitlines() if line.startswith("{")]
    assert any(e.get("event") == "exit" and e.get("status") == "success" for e in events)


def test_cli_lint_only_catches_bad_config(tmp_path):
    conf = tmp_path / "bad.conf"
    conf.write_text('stages = [ { type = NoSuchStage, name = x } ]')
    r = _run(
        f"--etl.config.uri={conf}",
        "--etl.config.environment=production",
        "--etl.config.lintOnly=true",
        "--etl.config.master=local[2]",
    )
    assert r.returncode == 1
    assert "unknown stage type" in r.stderr


def test_cli_requires_uri_and_environment():
    r = _run("--etl.config.environment=production")
    assert r.returncode == 1 and "etl.config.uri" in r.stderr
