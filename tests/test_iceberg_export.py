"""Iceberg v2 export: the metadata chain (metadata.json → manifest list →
manifests → data/delete files) is parsed BACK with independent readers
(json + our own Avro OCF decoder) and the spec's scan semantics are
replayed over it — the result must equal ``table.read``. No Iceberg
runtime ships in this sandbox (documented decision: the exporter targets
the PUBLIC spec; the jar-gated MERGE INTO alternative needs a runtime we
cannot download), so spec-replay is the strongest offline round-trip."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from arc_spark.cdc import ReplayRunner, write_change_stream
from arc_spark.cdc.bootstrap import create_table_for_stream
from arc_spark.formats.avro import read_ocf_bytes
from arc_spark.fs import LocalFS
from arc_spark.lake.iceberg_export import export_iceberg
from arc_spark.lake.table import LakeTable


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    """A replayed lake table with real deletes (tombstones in base files)."""
    d = tmp_path_factory.mktemp("ice")
    stream = write_change_stream(spark, str(d / "ev"), 1200, seed=3,
                                 num_partitions=4)
    table, _ = create_table_for_stream(spark, stream, str(d / "lake"),
                                       num_buckets=8)
    ReplayRunner(spark, stream, table, batch_size=700).run()
    return table


def _scan_like_iceberg(spark, meta_path):
    """Replay the spec: version-hint → metadata.json → current snapshot's
    manifest list → manifests → data files minus equality-deleted keys
    (applied to strictly smaller data sequence numbers)."""
    fs = LocalFS()
    meta = json.loads(fs.read_bytes(meta_path))
    snap = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == meta["current-snapshot-id"])
    _, manifests = read_ocf_bytes(fs.read_bytes(snap["manifest-list"]))
    data_files, deletes = [], []  # (path, seq) / (path, seq, eq_ids)
    for m in manifests:
        _, entries = read_ocf_bytes(fs.read_bytes(m["manifest_path"]))
        for e in entries:
            df_ = e["data_file"]
            if df_["content"] == 0:
                data_files.append((df_["file_path"], e["sequence_number"]))
            else:
                assert df_["content"] == 2  # equality deletes
                deletes.append((df_["file_path"], e["sequence_number"],
                                df_["equality_ids"]))
    schema_fields = {f["id"]: f["name"] for f in meta["schemas"][0]["fields"]}
    # resolve columns the way a spec-compliant reader does for id-less
    # parquet: through schema.name-mapping.default (first mapped name
    # present in the file wins, surfaced under the schema's field name)
    nm = json.loads(meta["properties"]["schema.name-mapping.default"])
    raw = spark.read.option("mergeSchema", "true").parquet(
        *[p for p, _ in data_files]
    )
    sel = []
    for entry in nm:
        name = schema_fields[entry["field-id"]]
        present = [n for n in entry["names"] if n in raw.columns]
        assert present, f"name mapping unresolvable for {name}: {entry}"
        sel.append(F.col(present[0]).alias(name))
    out = raw.select(*sel)
    for path, dseq, eq_ids in deletes:
        assert all(seq < dseq for _, seq in data_files)
        key_cols = [schema_fields[i] for i in eq_ids]
        dead = spark.read.parquet(path).select(*key_cols)
        out = out.join(dead, key_cols, "left_anti")
    return out


def test_export_round_trips_live_rows(spark, lake):
    res = export_iceberg(spark, lake)
    assert res["data_files"] > 0 and res["deleted_keys"] > 0
    assert res["delete_files"] == 1
    got = _scan_like_iceberg(spark, res["metadata"])
    want = lake.read(spark).select(*got.columns)
    assert got.count() == res["live_rows"] == want.count()
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_metadata_json_spec_shape(spark, lake):
    res = export_iceberg(spark, lake)
    fs = LocalFS()
    meta = json.loads(fs.read_bytes(res["metadata"]))
    assert meta["format-version"] == 2
    assert meta["partition-specs"] == [{"spec-id": 0, "fields": []}]
    schema = meta["schemas"][meta["current-schema-id"]]
    ids = []

    def walk(fields):
        for f in fields:
            ids.append(f["id"])
            t = f["type"]
            if isinstance(t, dict) and t.get("type") == "struct":
                walk(t["fields"])
            elif isinstance(t, dict) and t.get("type") == "list":
                ids.append(t["element-id"])
            elif isinstance(t, dict) and t.get("type") == "map":
                ids.extend([t["key-id"], t["value-id"]])

    walk(schema["fields"])
    assert len(ids) == len(set(ids)), "field ids must be unique"
    assert max(ids) <= meta["last-column-id"]
    # the internal _tombstone column is NOT exported
    names = [f["name"] for f in schema["fields"]]
    assert "_tombstone" not in names and "repo" in names
    # name mapping covers every top-level field
    nm = json.loads(meta["properties"]["schema.name-mapping.default"])
    assert {e["field-id"] for e in nm} == {f["id"] for f in schema["fields"]}
    # version hint (HadoopCatalog layout)
    hint = fs.read_bytes(res["metadata"].rsplit("/", 1)[0] + "/version-hint.text")
    assert hint == b"1"


def test_manifest_avro_field_ids_and_counts(spark, lake):
    import pyarrow.parquet as pq

    res = export_iceberg(spark, lake)
    fs = LocalFS()
    meta = json.loads(fs.read_bytes(res["metadata"]))
    snap = meta["snapshots"][0]
    mlist_schema, manifests = read_ocf_bytes(fs.read_bytes(snap["manifest-list"]))
    by_name = {f["name"]: f for f in mlist_schema["fields"]}
    assert by_name["manifest_path"]["field-id"] == 500
    assert by_name["sequence_number"]["field-id"] == 515
    data_m = [m for m in manifests if m["content"] == 0]
    del_m = [m for m in manifests if m["content"] == 1]
    assert len(data_m) == 1 and len(del_m) == 1
    assert data_m[0]["sequence_number"] == 1 < del_m[0]["sequence_number"] == 2
    eschema, entries = read_ocf_bytes(fs.read_bytes(data_m[0]["manifest_path"]))
    dfile = next(f for f in eschema["fields"] if f["name"] == "data_file")
    sub = {f["name"]: f["field-id"] for f in dfile["type"]["fields"]}
    assert sub["file_path"] == 100 and sub["record_count"] == 103
    # record_count per entry equals the parquet footer
    for e in entries:
        d = e["data_file"]
        assert d["record_count"] == pq.ParquetFile(d["file_path"]).metadata.num_rows
        assert d["file_size_in_bytes"] > 0 and d["file_format"] == "PARQUET"
    assert sum(e["data_file"]["record_count"] for e in entries) == res["physical_rows"]
    # equality ids point at the key columns
    _, dels = read_ocf_bytes(fs.read_bytes(del_m[0]["manifest_path"]))
    schema_ids = {f["name"]: f["id"] for f in meta["schemas"][0]["fields"]}
    assert dels[0]["data_file"]["equality_ids"] == [
        schema_ids[k] for k in ["repo", "path"]
    ]


def test_export_refuses_mor_debt(spark, lake, tmp_path):
    t = LakeTable(lake.root)  # fresh handle
    df = spark.createDataFrame(
        [("rX", "pX", "c", "py", "v", None, 10_000, "upsert")],
        "repo string, path string, commit string, lang string, "
        "content string, ts timestamp, seq long, op string",
    )
    r = t.merge(spark, df, epoch=9000, start_seq=10_000, end_seq=10_000,
                mode="delta")
    assert r["status"] == "committed"
    with pytest.raises(ValueError, match="compact"):
        export_iceberg(spark, t)
    t.compact(spark)
    res = export_iceberg(spark, t)
    got = _scan_like_iceberg(spark, res["metadata"])
    want = t.read(spark).select(*got.columns)
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_export_maps_renames_into_name_mapping(spark, tmp_path):
    """Metadata-only rename: the exported schema shows the NEW name while
    the name mapping also carries the old one — Iceberg's own recipe for
    reading pre-rename parquet without rewrite."""
    d = str(tmp_path / "rn")
    stream = write_change_stream(spark, f"{d}/ev", 300, seed=5,
                                 num_partitions=2)
    table, _ = create_table_for_stream(spark, stream, f"{d}/lake",
                                       num_buckets=4)
    ReplayRunner(spark, stream, table, batch_size=300).run()
    table.alter_schema(rename={"content": "body"})
    res = export_iceberg(spark, table)
    meta = json.loads(LocalFS().read_bytes(res["metadata"]))
    schema = meta["schemas"][0]
    names = [f["name"] for f in schema["fields"]]
    assert "body" in names and "content" not in names
    nm = json.loads(meta["properties"]["schema.name-mapping.default"])
    body = next(e for e in nm if "body" in e["names"])
    assert "content" in body["names"]  # old files resolve to the same id
    # the mapping-aware scan reads the OLD parquet column under the NEW
    # name and still matches the lake's own coalescing read
    got = _scan_like_iceberg(spark, res["metadata"])
    assert "body" in got.columns
    want = table.read(spark).select(*got.columns)
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_iceberg_export_stage(spark, lake):
    from arc_spark.pipeline import run_config

    cfg = {"stages": [{
        "type": "IcebergExportExecute", "name": "pub", "tableURI": lake.root,
    }]}
    _, ctx = run_config(spark, cfg)
    ev = next(e for e in ctx.events if e.get("stage") == "pub")
    assert ev["data_files"] > 0 and ev["live_rows"] > 0
    got = _scan_like_iceberg(spark, ev["metadata"])
    want = lake.read(spark).select(*got.columns)
    assert got.exceptAll(want).isEmpty()
