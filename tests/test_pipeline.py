"""Config-driven pipeline tests — mirrors the reference's end-to-end job
fixtures (src/test/resources/conf/job/active_customers.json pattern) and
its config-error / lint behaviors."""

from __future__ import annotations

import json
import os

import pytest

from arc_spark.pipeline import ConfigError, run_config
from arc_spark.pipeline.stages import ChaosMonkey, ControlFlow


@pytest.fixture()
def csv_dir(tmp_path):
    p = tmp_path / "customers.csv"
    p.write_text(
        "id,name,balance,active\n"
        "1,alice,100.5,true\n"
        "2,bob,-3.25,false\n"
        "3,carol,7.75,true\n"
        "4,dave,oops,true\n"
    )
    return str(p)


SCHEMA = [
    {"name": "id", "type": "long", "nullable": False},
    {"name": "name", "type": "string"},
    {"name": "balance", "type": "decimal", "precision": 10, "scale": 2},
    {"name": "active", "type": "boolean", "trueValues": ["true"], "falseValues": ["false"]},
]


def _job(csv_path: str, out_dir: str) -> dict:
    return {
        "stages": [
            {
                "type": "DelimitedExtract",
                "name": "extract customers",
                "inputURI": csv_path,
                "outputView": "customers_raw",
                "options": {"header": "true"},
            },
            {
                "type": "TypingTransform",
                "name": "type customers",
                "inputView": "customers_raw",
                "outputView": "customers_typed",
                "schema": SCHEMA,
            },
            {
                "type": "SQLValidate",
                "name": "error gate",
                "sql": (
                    "SELECT SUM(CASE WHEN SIZE(_errors) > 0 THEN 1 ELSE 0 END) "
                    "<= ${max_errors=1}, 'error rate ok' FROM customers_typed"
                ),
            },
            {
                "type": "SQLTransform",
                "name": "active customers",
                "sql": "SELECT id, name, balance FROM customers_typed "
                       "WHERE active AND SIZE(_errors) = 0 ORDER BY id",
                "outputView": "active_customers",
            },
            {
                "type": "ParquetLoad",
                "name": "write",
                "inputView": "active_customers",
                "outputURI": out_dir,
            },
        ]
    }


def test_end_to_end_job(spark, csv_dir, tmp_path):
    out = str(tmp_path / "out")
    df, ctx = run_config(spark, json.dumps(_job(csv_dir, out)))
    rows = spark.read.parquet(out).orderBy("id").collect()
    assert [r["name"] for r in rows] == ["alice", "carol"]
    events = [e["event"] for e in ctx.events]
    assert events.count("stage.complete") == 5
    assert all(e["duration_ms"] >= 0 for e in ctx.events if "duration_ms" in e)
    # SQLTransform records its scan pushdown info (QueryExecutionUtils parity)
    scans = [e for e in ctx.events if e["event"] == "stage.scans"]
    assert scans and any("csv" in s.get("format", "") for e in scans for s in e["scans"])


def test_validate_gate_fails_job(spark, csv_dir, tmp_path):
    cfg = _job(csv_dir, str(tmp_path / "out"))
    with pytest.raises(ValueError, match="validation failed"):
        run_config(spark, json.dumps(cfg), args={"max_errors": "0"})


def test_param_substitution_from_env(spark, csv_dir, tmp_path, monkeypatch):
    monkeypatch.setenv("ETL_CONF_MAX_ERRORS", "5")
    cfg = json.dumps(_job(csv_dir, str(tmp_path / "out"))).replace(
        "${max_errors=1}", "${max_errors}"
    )
    df, ctx = run_config(spark, cfg)
    assert df is not None


def test_config_error_accumulation(spark):
    cfg = {
        "stages": [
            {"type": "ParquetExtract", "name": "a", "inputURI": "/x", "outputVew": "t"},
            {"type": "SQLTransfrom", "name": "b", "sql": "SELECT 1", "outputView": "v"},
            {"type": "SQLTransform", "name": "c", "outputView": "v"},
        ]
    }
    with pytest.raises(ConfigError) as ei:
        run_config(spark, cfg)
    msg = str(ei.value)
    assert "did you mean 'outputView'" in msg
    assert "did you mean 'SQLTransform'" in msg
    assert "exactly one of" in msg


def test_sql_parse_validation_at_config_time(spark):
    cfg = {
        "stages": [
            {"type": "SQLTransform", "name": "bad", "sql": "SELEC oops FRM", "outputView": "v"}
        ]
    }
    with pytest.raises(ConfigError):
        run_config(spark, cfg)


def test_environment_filtering(spark):
    cfg = {
        "stages": [
            {
                "type": "SQLTransform", "name": "prod only", "sql": "SELECT 1 AS x",
                "outputView": "v1", "environments": ["production"],
            },
            {
                "type": "SQLTransform", "name": "test only", "sql": "SELECT 2 AS x",
                "outputView": "v2", "environments": ["test"],
            },
        ]
    }
    df, ctx = run_config(spark, cfg, environment="test")
    assert df.first()["x"] == 2
    assert not any(e["stage"] == "prod only" and e["event"] == "stage.complete" for e in ctx.events)


def test_lint_mode_runs_nothing(spark, csv_dir, tmp_path):
    out = str(tmp_path / "lintout")
    df, ctx = run_config(spark, json.dumps(_job(csv_dir, out)), lint=True)
    assert df is None and not os.path.exists(out)


def test_controlflow_skips_remaining(spark):
    cfg = {
        "stages": [
            {"type": "ControlFlowExecute", "name": "gate",
             "sql": "SELECT FALSE, 'stop here'"},
            {"type": "SQLTransform", "name": "never", "sql": "SELECT 1 AS x", "outputView": "v"},
        ]
    }
    df, ctx = run_config(spark, cfg, lifecycle=[ControlFlow()])
    assert df is None
    assert any(e["event"] == "pipeline.skipRemaining" for e in ctx.events)


def test_chaosmonkey_injects_failure(spark):
    cfg = {"stages": [{"type": "SQLTransform", "name": "s", "sql": "SELECT 1 AS x", "outputView": "v"}]}
    with pytest.raises(RuntimeError, match="ChaosMonkey"):
        run_config(spark, cfg, lifecycle=[ChaosMonkey(probability=1.0, seed=1)])


def test_equality_validate(spark):
    cfg = {
        "stages": [
            {"type": "SQLTransform", "name": "a", "sql": "SELECT * FROM VALUES (1,'x'),(2,'y') t(id, v)", "outputView": "va"},
            {"type": "SQLTransform", "name": "b", "sql": "SELECT * FROM VALUES (2,'y'),(1,'x') t(id, v)", "outputView": "vb"},
            {"type": "EqualityValidate", "name": "eq", "leftView": "va", "rightView": "vb"},
        ]
    }
    run_config(spark, cfg)  # passes: same rows, order-insensitive
    cfg["stages"][1]["sql"] = "SELECT * FROM VALUES (2,'y'),(3,'z') t(id, v)"
    with pytest.raises(ValueError, match="views differ"):
        run_config(spark, cfg)


def test_metadata_filter_transform(spark):
    cfg = {
        "stages": [
            {"type": "SQLTransform", "name": "src",
             "sql": "SELECT 1 AS id, 'bob' AS name, 'x@y.z' AS email", "outputView": "people"},
            {"type": "MetadataTransform", "name": "tag",
             "inputView": "people", "outputView": "people_tagged",
             "schema": [
                 {"name": "email", "type": "string", "metadata": {"pii": True}},
             ]},
            {"type": "MetadataFilterTransform", "name": "strip pii",
             "inputView": "people_tagged", "outputView": "people_safe",
             "sql": "SELECT name FROM metadata WHERE get_json_object(metadata, '$.pii') IS NULL "
                    "OR get_json_object(metadata, '$.pii') = 'false'"},
        ]
    }
    df, _ = run_config(spark, cfg)
    assert sorted(df.columns) == ["id", "name"]


def test_pipeline_execute_inlines_subpipeline(spark, tmp_path):
    sub = {"stages": [{"type": "SQLTransform", "name": "inner", "sql": "SELECT 7 AS x", "outputView": "inner_v"}]}
    sub_path = tmp_path / "sub.json"
    sub_path.write_text(json.dumps(sub))
    cfg = {
        "stages": [
            {"type": "PipelineExecute", "name": "include", "uri": str(sub_path)},
            {"type": "SQLTransform", "name": "outer", "sql": "SELECT x + 1 AS y FROM inner_v", "outputView": "outer_v"},
        ]
    }
    df, _ = run_config(spark, cfg)
    assert df.first()["y"] == 8


def test_config_execute_feeds_lazy_stage(spark):
    """Runtime-computed params (ConfigExecute) resolve in later lazy stages
    — the LazyEvaluator mechanism (plugins/pipeline/LazyEvaluator.scala)."""
    cfg = {
        "stages": [
            {"type": "ConfigExecute", "name": "cfg",
             "sql": "SELECT to_json(named_struct('threshold', '7'))"},
            {"type": "SQLTransform", "name": "use", "resolution": "lazy",
             "sql": "SELECT ${threshold} AS t", "outputView": "v"},
        ]
    }
    df, _ = run_config(spark, json.dumps(cfg))
    assert df.first()["t"] == 7


def test_statistics_and_metadata_extract(spark):
    cfg = {
        "stages": [
            {"type": "SQLTransform", "name": "src",
             "sql": "SELECT id, CAST(id * 1.5 AS DOUBLE) AS v FROM RANGE(100)",
             "outputView": "nums"},
            {"type": "StatisticsExtract", "name": "prof", "inputView": "nums", "outputView": "stats"},
            {"type": "MetadataExtract", "name": "meta", "inputView": "nums", "outputView": "meta_v"},
        ]
    }
    df, ctx = run_config(spark, cfg)
    stats = {r["col_name"]: r for r in spark.table("stats").collect()}
    assert stats["v"]["count"] == 100 and stats["v"]["max"] == 148.5
    assert {r["name"] for r in df.collect()} == {"id", "v"}


def test_schema_view_typing(spark):
    """Schema-as-data: a view of field definitions drives TypingTransform
    (parseArcSchemaDataFrame parity, schema/ArcSchema.scala:25-27)."""
    cfg = {
        "stages": [
            {"type": "SQLTransform", "name": "schema source", "outputView": "schema_v",
             "sql": "SELECT 'n' AS name, 'integer' AS type, true AS nullable "
                    "UNION ALL SELECT 'label', 'string', true"},
            {"type": "SQLTransform", "name": "raw", "outputView": "raw_v",
             "sql": "SELECT '42' AS n, 'x' AS label UNION ALL SELECT 'bad', 'y'"},
            {"type": "TypingTransform", "name": "typed", "inputView": "raw_v",
             "outputView": "typed_v", "schemaView": "schema_v"},
        ]
    }
    df, _ = run_config(spark, json.dumps(cfg))
    rows = {r["label"]: r for r in df.collect()}
    assert rows["x"]["n"] == 42 and rows["x"]["_errors"] == []
    assert rows["y"]["n"] is None and len(rows["y"]["_errors"]) == 1


def test_lake_merge_load_mode_and_lineage(spark, tmp_path):
    """LakeMergeLoad exposes merge mode + per-bucket lineage from config:
    epoch 0 bootstraps copy-on-write, epoch 1 lands as a merge-on-read
    delta, and bucketLineage counters reach ctx.user_data."""
    from arc_spark.lake.table import LakeTable
    from arc_spark.pipeline import run_config

    root = str(tmp_path / "lml")
    spark.createDataFrame(
        [("r", f"p{i}", i, "update", f"v{i}") for i in range(20)],
        "repo string, path string, seq long, op string, content string",
    ).createOrReplaceTempView("lml_changes")
    cfg0 = {"stages": [
        {"type": "LakeMergeLoad", "name": "m0", "inputView": "lml_changes",
         "tableURI": root, "epoch": 0, "startSeq": 0, "endSeq": 19,
         "numBuckets": 4, "bucketLineage": True},
    ]}
    _, ctx0 = run_config(spark, cfg0)
    r0 = ctx0.user_data["m0.merge"]
    assert r0["status"] == "committed" and r0["mode"] == "cow"
    assert sum(v["keys_applied"] for v in r0["bucket_lineage"].values()) == 20

    spark.createDataFrame(
        [("r", "p1", 100, "update", "v1b")],
        "repo string, path string, seq long, op string, content string",
    ).createOrReplaceTempView("lml_tail")
    # epoch 1 also exercises the commit-lock knobs on the single-epoch
    # primitive (same surface as CDCReplayExecute): commit succeeds
    # through the locker and the lock is released afterwards
    lock_root = "memory://locks/lml_test"
    cfg1 = {"stages": [
        {"type": "LakeMergeLoad", "name": "m1", "inputView": "lml_tail",
         "tableURI": root, "epoch": 1, "startSeq": 100, "endSeq": 100,
         "mode": "delta", "bucketLineage": True,
         "commitLockURI": lock_root, "commitLockLeaseSeconds": 60},
    ]}
    _, ctx1 = run_config(spark, cfg1)
    r1 = ctx1.user_data["m1.merge"]
    assert r1["status"] == "committed" and r1["mode"] == "delta"
    assert sum(v["keys_applied"] for v in r1["bucket_lineage"].values()) == 1
    from arc_spark.fs import get_fs

    assert get_fs(lock_root).listdir(lock_root) == []  # released

    rows = {r["path"]: r["content"] for r in LakeTable(root).read(spark).collect()}
    assert rows["p1"] == "v1b" and len(rows) == 20


def test_lazy_evaluator_resolution(spark, tmp_path):
    """resolution: lazy defers config resolution to execute time — a
    ${param} computed by a PRECEDING ConfigExecute (and unknown at parse
    time) resolves; the same config without lazy fails at parse/execute."""
    import pytest as _pytest

    from arc_spark.pipeline import run_config
    from arc_spark.pipeline.config import ConfigError

    src = str(tmp_path / "lazy_in")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").write.parquet(src)

    cfg = {"stages": [
        {"type": "ConfigExecute", "name": "compute",
         "sql": f"""SELECT to_json(named_struct('dyn.uri', '{src}'))"""},
        {"type": "ParquetExtract", "name": "e", "resolution": "lazy",
         "inputURI": "${dyn.uri}", "outputView": "lazy_out"},
    ]}
    df, _ = run_config(spark, cfg)
    assert df.count() == 2

    # without lazy the placeholder survives to execute and the read fails
    eager = {"stages": [
        {"type": "ConfigExecute", "name": "compute",
         "sql": f"""SELECT to_json(named_struct('dyn.uri', '{src}'))"""},
        {"type": "ParquetExtract", "name": "e",
         "inputURI": "${dyn.uri}", "outputView": "eager_out"},
    ]}
    with _pytest.raises(Exception):
        run_config(spark, eager)

    # lazy still validates: an unknown key surfaces at execute time
    bad = {"stages": [
        {"type": "ParquetExtract", "name": "e", "resolution": "lazy",
         "inputURI": src, "outputView": "x", "noSuchKey": 1},
    ]}
    with _pytest.raises(ConfigError, match="noSuchKey"):
        run_config(spark, bad)
