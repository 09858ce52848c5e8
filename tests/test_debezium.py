"""Debezium envelope → canonical change frame (arc_spark/cdc/debezium.py)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from arc_spark.cdc.apply import last_writer_wins
from arc_spark.cdc.debezium import debezium_envelope_schema, parse_debezium

PAYLOAD = "repo string, path string, commit string, lang string, content string"


def _row(repo, path, content, *, commit="c0", lang="py"):
    return {"repo": repo, "path": path, "commit": commit, "lang": lang, "content": content}


def _event(op, lsn, *, before=None, after=None, wrapped=True, ts_ms=1000):
    env = {
        "before": before,
        "after": after,
        "op": op,
        "ts_ms": ts_ms,
        "source": {"lsn": lsn, "pos": None, "row": 0, "ts_ms": ts_ms - 1},
    }
    return json.dumps({"payload": env} if wrapped else env)


@pytest.fixture()
def raw(spark):
    events = [
        _event("c", 10, after=_row("r1", "a.py", "v1")),
        _event("u", 20, after=_row("r1", "a.py", "v2")),
        # delete carries the key in `before`, after is null
        _event("d", 30, before=_row("r1", "b.py", "gone")),
        # unwrapped (SMT-flattened) record — wrapper="auto" must take it
        _event("r", 15, after=_row("r2", "c.py", "snap"), wrapped=False),
        # Kafka tombstone record: NULL value, always dropped
        None,
    ]
    return spark.createDataFrame([(v,) for v in events], "value string")


def test_envelope_schema_embeds_payload(spark):
    s = debezium_envelope_schema(PAYLOAD)
    assert [f.name for f in s.fields] == ["before", "after", "op", "ts_ms", "source"]
    assert s["after"].dataType["content"].dataType.simpleString() == "string"


def test_parse_maps_ops_and_sides(spark, raw):
    out = parse_debezium(raw, PAYLOAD).orderBy("seq").collect()
    assert [r["op"] for r in out] == ["insert", "insert", "update", "delete"]
    assert [r["seq"] for r in out] == [10, 15, 20, 30]
    # delete row's key columns came from `before`
    d = out[-1]
    assert (d["repo"], d["path"], d["content"]) == ("r1", "b.py", "gone")
    # the unwrapped record parsed via the auto fallback
    assert out[1]["repo"] == "r2"


def test_parse_is_pure_codegen(spark, raw):
    plan = parse_debezium(raw, PAYLOAD)._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEvalPython", "BatchEvalPython", "mapInPandas"):
        assert marker not in plan


def test_unknown_op_passes_through_for_bad_event_gate(spark):
    df = spark.createDataFrame(
        [(_event("x", 99, after=_row("r", "p", "v")),)], "value string"
    )
    assert parse_debezium(df, PAYLOAD).first()["op"] == "x"


def test_malformed_json_surfaces_or_drops(spark):
    df = spark.createDataFrame([("{not json",)], "value string")
    kept = parse_debezium(df, PAYLOAD)
    # default: row survives with NULL key/seq → the runner's bad-event
    # gate (NULL key or seq) catches it
    r = kept.first()
    assert r["repo"] is None and r["seq"] is None
    assert parse_debezium(df, PAYLOAD, drop_unparseable=True).count() == 0


def test_seq_expr_override_and_lww(spark, raw):
    out = parse_debezium(raw, PAYLOAD, seq_expr=F.col("_env")["ts_ms"] * 100)
    assert out.orderBy("seq").first()["seq"] == 100000
    # end-to-end shape: parsed frame drops straight into the LWW kernel
    final = last_writer_wins(
        parse_debezium(raw, PAYLOAD).drop("_ts_ms"), ["repo", "path"], "seq"
    )
    rows = {(r["repo"], r["path"]): r for r in final.collect()}
    assert rows[("r1", "a.py")]["content"] == "v2"
    assert rows[("r1", "b.py")]["op"] == "delete"


def test_payload_column_collision_raises(spark):
    with pytest.raises(ValueError, match="collide"):
        parse_debezium(
            spark.createDataFrame([("{}",)], "value string"), "repo string, seq long"
        )
