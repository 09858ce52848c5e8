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
    post_counts: dict[str, int] = {}

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
        _Handler.post_counts[self.path] = _Handler.post_counts.get(self.path, 0) + 1
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


def test_http_transform_batches_requests(spark, http_server):
    """batchSize rows are joined into ONE POST and the response splits
    back per row (HTTPTransform.scala:214-270) — request count is
    ceil(rows/batchSize), not one per row."""
    spark.createDataFrame(
        [(f"m{i}",) for i in range(6)], "value string"
    ).coalesce(1).createOrReplaceTempView("batch_msgs")
    _Handler.post_counts.pop("/batched", None)
    cfg = {
        "stages": [
            {"type": "HTTPTransform", "name": "t", "inputView": "batch_msgs",
             "outputView": "bresp", "uri": http_server + "/batched",
             "batchSize": 3},
        ]
    }
    df, _ = run_config(spark, json.dumps(cfg))
    assert {r["body"] for r in df.collect()} == {f"M{i}" for i in range(6)}
    assert _Handler.post_counts["/batched"] == 2  # 6 rows / batchSize 3


def test_jdbc_load_detects_short_write(spark, monkeypatch):
    """Pre/post count-delta verification catches lost rows even when the
    target table already has data (the total-count floor check was
    vacuous for append-to-non-empty, JDBCLoad.scala:279-293)."""
    from pyspark.sql.readwriter import DataFrameWriter

    url = "jdbc:derby:memory:shortw;create=true"
    spark.range(100).selectExpr("CAST(id AS INT) AS id").write.jdbc(
        url, "dest", mode="overwrite", properties=DERBY
    )
    spark.createDataFrame([(200,), (201,), (202,), (203,)], "id int").createOrReplaceTempView(
        "short_src"
    )
    orig = DataFrameWriter.jdbc

    def lossy(self, jurl, table, mode=None, properties=None):
        half = self._df.limit(2)  # simulate a short write
        return orig(half.write, jurl, table, mode=mode, properties=properties)

    monkeypatch.setattr(DataFrameWriter, "jdbc", lossy)
    cfg = {
        "stages": [
            {"type": "JDBCLoad", "name": "w", "inputView": "short_src",
             "jdbcURL": url, "tableName": "dest", "saveMode": "append",
             "params": DERBY},
        ]
    }
    with pytest.raises(Exception, match="verification failed"):
        run_config(spark, json.dumps(cfg))
    monkeypatch.undo()
    # healthy append passes and the delta matches
    df, _ = run_config(spark, json.dumps(cfg))
    assert spark.read.jdbc(url, "dest", properties=DERBY).count() == 106  # 100+2+4


def test_textload_singlefile_per_filename_ordered(spark, tmp_path):
    """[value, filename, index] signature: one file per filename, rows
    ordered by index, prefix/separator/suffix applied, written paths in
    ctx.events (load/TextLoad.scala:160-250)."""
    a, b = str(tmp_path / "out" / "a.txt"), str(tmp_path / "out" / "b.txt")
    spark.createDataFrame(
        [("2nd", a, 2), ("1st", a, 1), ("only", b, 1)],
        "value string, filename string, index int",
    ).createOrReplaceTempView("tl_src")
    cfg = {
        "stages": [
            {"type": "TextLoad", "name": "w", "inputView": "tl_src",
             "singleFile": True, "prefix": "[", "separator": "|", "suffix": "]"},
        ]
    }
    _, ctx = run_config(spark, json.dumps(cfg))
    assert open(a).read() == "[1st|2nd]"
    assert open(b).read() == "[only]"
    files = [e for e in ctx.events if e["event"] == "stage.outputFiles"][0]["outputFiles"]
    assert files == sorted([a, b])


def test_udf_parity_random_struct_keys_uri_filename_array(spark, tmp_path):
    from arc_spark.functions import register_udfs

    names = register_udfs(spark)
    assert {"random", "struct_keys", "get_uri_filename_array"} <= set(names)
    r = spark.sql("SELECT random() AS r").first()["r"]
    assert 0.0 <= r < 1.0
    ks = spark.sql("SELECT struct_keys(named_struct('a', 1, 'b', 2)) AS k").first()["k"]
    assert ks == ["a", "b"]
    (tmp_path / "f1.txt").write_text("one")
    (tmp_path / "f2.txt").write_text("two")
    row = spark.sql(
        f"SELECT get_uri_filename_array('{tmp_path}/f*.txt') AS arr"
    ).first()["arr"]
    assert [(bytes(e["value"]), e["filename"].split("/")[-1]) for e in row] == [
        (b"one", "f1.txt"), (b"two", "f2.txt"),
    ]


def test_immutable_views_policy(spark):
    spark.range(3).createOrReplaceTempView("iv_src")
    cfg = {
        "stages": [
            {"type": "SQLTransform", "name": "a", "sql": "SELECT * FROM iv_src",
             "outputView": "iv_dup"},
            {"type": "SQLTransform", "name": "b", "sql": "SELECT * FROM iv_src",
             "outputView": "iv_dup"},
        ]
    }
    with pytest.raises(Exception, match="immutableViews"):
        run_config(spark, json.dumps(cfg), immutable_views=True)
    df, _ = run_config(spark, json.dumps(cfg))  # default: allowed
    assert df.count() == 3


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


def test_jdbc_load_truncate_and_unsupported_columns(spark, tmp_path):
    """truncate-on-Overwrite reaches the JDBC writer options; array/null
    columns fail unless dropUnsupported (JDBCLoad.scala:219-258)."""
    import pytest as _pytest

    from arc_spark.pipeline import run_config

    url = f"jdbc:derby:{tmp_path}/jdbc_trunc;create=true"
    spark.createDataFrame([(1, ["x"]), (2, ["y"])], "id: long, tags: array<string>") \
        .createOrReplaceTempView("jdbc_bad_src")
    cfg = {"stages": [
        {"type": "JDBCLoad", "name": "j", "inputView": "jdbc_bad_src",
         "jdbcURL": url, "tableName": "T1", "saveMode": "overwrite"},
    ]}
    with _pytest.raises(Exception, match="unsupported"):
        run_config(spark, cfg)
    cfg["stages"][0]["dropUnsupported"] = True
    cfg["stages"][0]["truncate"] = True
    run_config(spark, cfg)
    got = spark.read.jdbc(url, "T1").collect()
    assert {r["id"] for r in got} == {1, 2} and got[0].asDict().keys() == {"id"}
    # overwrite again with truncate=true: table survives, rows replaced
    run_config(spark, cfg)
    assert spark.read.jdbc(url, "T1").count() == 2
