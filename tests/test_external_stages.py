"""External-system stages exercised against in-process backends: JDBC via
Derby in-memory (ships with Spark), HTTP via a localhost server — the
integration-test role of the reference's docker-compose ``it.sh`` suite
(SURVEY.md §5), without external infrastructure."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from arc_spark.pipeline import run_config

DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


# ---------------------------------------------------------------------------
# JDBC (Derby in-memory)
# ---------------------------------------------------------------------------


def test_jdbc_load_then_extract_roundtrip(spark):
    url = "jdbc:derby:memory:rt;create=true"
    spark.createDataFrame(
        [(1, "alice", 10.5), (2, "bob", -3.0), (3, "carol", 7.0)],
        "id int, name string, bal double",
    ).createOrReplaceTempView("people_src")
    cfg = {
        "stages": [
            {"type": "JDBCLoad", "name": "w", "inputView": "people_src",
             "jdbcURL": url, "tableName": "people", "saveMode": "overwrite",
             "params": DERBY},
            {"type": "JDBCExtract", "name": "r", "jdbcURL": url,
             "tableName": "people", "outputView": "people_back", "params": DERBY},
        ]
    }
    df, _ = run_config(spark, json.dumps(cfg))
    assert sorted((r["id"], r["name"]) for r in df.collect()) == [
        (1, "alice"), (2, "bob"), (3, "carol")
    ]


def test_jdbc_extract_partitioned_auto_bounds(spark):
    url = "jdbc:derby:memory:pb;create=true"
    spark.range(100).selectExpr("CAST(id AS INT) AS id", "id * 2 AS v").write.jdbc(
        url, "nums", mode="overwrite", properties=DERBY
    )
    cfg = {
        "stages": [
            {"type": "JDBCExtract", "name": "r", "jdbcURL": url,
             "tableName": "nums", "outputView": "nums_v", "params": DERBY,
             "partitionColumn": "id", "numPartitions": 4},
        ]
    }
    df, _ = run_config(spark, json.dumps(cfg))
    assert df.count() == 100
    assert df.rdd.getNumPartitions() == 4  # MIN/MAX bounds split the scan


def test_jdbc_execute_ddl(spark):
    url = "jdbc:derby:memory:ddl;create=true"
    cfg = {
        "stages": [
            {"type": "JDBCExecute", "name": "ddl", "jdbcURL": url,
             "sql": "CREATE TABLE widgets (id INT, nm VARCHAR(20))"},
        ]
    }
    run_config(spark, json.dumps(cfg))
    back = spark.read.jdbc(url, "widgets", properties=DERBY)
    assert back.count() == 0 and len(back.columns) == 2


# ---------------------------------------------------------------------------
# HTTP (localhost server)
# ---------------------------------------------------------------------------


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def _respond(self, body: bytes, ctype="text/plain"):
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        self._respond(b"hello:" + self.path.encode())

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        data = self.rfile.read(n)
        if self.path == "/predict":
            payload = json.loads(data)
            preds = [len(str(x)) * 1.0 for x in payload["instances"]]
            self._respond(json.dumps({"predictions": preds}).encode(), "application/json")
        else:
            self._respond(data.upper())


@pytest.fixture(scope="module")
def http_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_transform_posts_column(spark, http_server):
    spark.createDataFrame([("abc",), ("xyz",)], "value string").createOrReplaceTempView("msgs")
    cfg = {
        "stages": [
            {"type": "HTTPTransform", "name": "t", "inputView": "msgs",
             "outputView": "resp", "uri": http_server + "/echo"},
        ]
    }
    df, _ = run_config(spark, json.dumps(cfg))
    assert {r["body"] for r in df.collect()} == {"ABC", "XYZ"}


def test_http_extract_single_uri_and_view(spark, http_server):
    cfg = {
        "stages": [
            {"type": "HTTPExtract", "name": "one", "inputURI": http_server + "/a",
             "outputView": "got"},
        ]
    }
    df, _ = run_config(spark, json.dumps(cfg))
    row = df.first()
    assert row["statusCode"] == 200 and row["body"] == "hello:/a"

    spark.createDataFrame(
        [(http_server + "/x",), (http_server + "/y",)], "value string"
    ).createOrReplaceTempView("uris")
    cfg2 = {
        "stages": [
            {"type": "HTTPExtract", "name": "many", "inputView": "uris",
             "outputView": "got2"},
        ]
    }
    df2, _ = run_config(spark, json.dumps(cfg2))
    assert {r["body"] for r in df2.collect()} == {"hello:/x", "hello:/y"}


def test_http_load_and_execute(spark, http_server):
    spark.createDataFrame([("p1",), ("p2",)], "value string").createOrReplaceTempView("outbox")
    cfg = {
        "stages": [
            {"type": "HTTPLoad", "name": "send", "inputView": "outbox",
             "outputURI": http_server + "/sink"},
            {"type": "HTTPExecute", "name": "ping", "uri": http_server + "/hook",
             "payloads": {"job": "done"}},
        ]
    }
    run_config(spark, json.dumps(cfg))  # raises on non-2xx


def test_tensorflow_serving_transform(spark, http_server):
    spark.createDataFrame([("ab",), ("abcd",)], "value string").createOrReplaceTempView("feats")
    cfg = {
        "stages": [
            {"type": "TensorFlowServingTransform", "name": "tf", "inputView": "feats",
             "outputView": "scored", "uri": http_server + "/predict",
             "responseType": "double"},
        ]
    }
    df, _ = run_config(spark, json.dumps(cfg))
    got = {r["value"]: r["result"] for r in df.collect()}
    assert got == {"ab": 2.0, "abcd": 4.0}


def test_get_uri_udfs(spark, http_server):
    import gzip as _gzip

    from arc_spark.functions import register_udfs

    register_udfs(spark)
    spark.createDataFrame(
        [(http_server + "/data",)], "u string"
    ).createOrReplaceTempView("uris_udf")
    row = spark.sql("SELECT get_uri(u) AS b FROM uris_udf").first()
    assert bytes(row["b"]) == b"hello:/data"
    row2 = spark.sql(
        f"SELECT get_uri_array('{http_server}/p1,{http_server}/p2') AS arr"
    ).first()
    assert [bytes(x) for x in row2["arr"]] == [b"hello:/p1", b"hello:/p2"]


def test_jdbc_load_streaming_foreach_batch(spark, tmp_path):
    """Streaming JDBC sink: foreachBatch + df.write.jdbc (the reference's
    JDBCSink ForeachWriter role, util/JDBCSink.scala:17-80)."""
    url = "jdbc:derby:memory:stream;create=true"
    src = str(tmp_path / "in")
    spark.range(10).selectExpr("id", "id * 2 AS v").coalesce(1).write.parquet(src)
    cfg = {
        "stages": [
            {"type": "ParquetExtract", "name": "e", "inputURI": src,
             "outputView": "sv",
             "schema": [{"name": "id", "type": "long"}, {"name": "v", "type": "long"}]},
            {"type": "JDBCLoad", "name": "w", "inputView": "sv",
             "jdbcURL": url, "tableName": "stream_t", "saveMode": "append",
             "params": DERBY,
             "checkpointLocation": str(tmp_path / "ck")},
        ]
    }
    _, ctx = run_config(spark, json.dumps(cfg), streaming=True)
    for q in ctx.user_data["streaming_queries"]:
        q.processAllAvailable()
        q.stop()
    back = spark.read.jdbc(url, "stream_t", properties=DERBY)
    assert back.count() == 10
