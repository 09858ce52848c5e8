"""Zero-copy export of a LakeTable snapshot as an Apache Iceberg v2 table.

Interop with the standard table-format ecosystem: after ``export_iceberg``
any Iceberg reader (Spark+iceberg-runtime, Trino, DuckDB's iceberg
extension, pyiceberg) pointed at the table root sees EXACTLY the lake
table's live rows — without copying a single data byte. The export writes
only metadata, per the public Iceberg table spec
(https://iceberg.apache.org/spec/):

- ``metadata/v{N}.metadata.json`` + ``version-hint.text`` (HadoopCatalog
  layout: no catalog service needed, the directory IS the table).
  Repeated exports APPEND: each call writes the next metadata version
  with the new snapshot added to the history (stable table-uuid,
  monotonically increasing sequence numbers, schema-id reuse when the
  schema is unchanged), so Iceberg readers get real snapshot history and
  time travel across exports — older snapshots stay readable until the
  lake's own expire_snapshots removes their data files,
- a manifest-list Avro file and one data-manifest Avro file listing the
  snapshot's base parquet files in place (paths, footer row counts, byte
  sizes),
- our parquet carries no Iceberg field ids, so the metadata sets the
  spec's ``schema.name-mapping.default`` property; the lake's
  metadata-only column RENAMES become extra names on the same mapped
  field — Iceberg's own mechanism for reading pre-rename files — and
  DROPPED columns are simply absent from the schema (readers ignore
  unmapped parquet columns),
- deleted keys: lake base files retain tombstone rows (they fence late
  arrivals), which a plain file scan would resurrect. The export writes
  an Iceberg v2 EQUALITY-DELETE file carrying the key columns of every
  RESOLVED-tombstoned key (equality_ids = the key fields) at the top
  sequence number — spec rule "equality deletes apply to data files with
  a strictly smaller data sequence number" removes exactly the
  tombstoned keys, INCLUDING the tombstone rows themselves. Delete files
  are the only thing written under ``data/`` and are O(deleted keys),
  not a data copy,
- outstanding MOR delta files export ZERO-COPY too: the lake's
  shadow-by-max-seq semantics map exactly onto Iceberg's sequence-number
  rules. Delta chains are chronological per bucket (appended per merge
  epoch) and keys never cross buckets, so position-in-chain composes
  into global LEVELS: level j's files become Iceberg data files at data
  sequence ``base + 1 + j``, paired with an equality-delete file of ALL
  keys present in level j at the SAME sequence number — which kills
  every older version (base and levels < j) while the level's own rows
  survive (strictly-smaller rule). Tombstone rows inside delta files are
  data rows whose key either reappears later (killed by that level's
  delete) or is the key's final version (killed by the top-sequence
  resolved-tombstone delete above). A reader therefore sees exactly
  LWW-resolved state with no compaction required — ``icebergMirror`` can
  publish after every MOR epoch. Read cost grows with chain length
  (one aggregated join per delete kind), the same debt the lake's own
  MOR read pays; normal compaction cadence bounds both. The level
  encoding requires per-key seq order to match chain order — true for a
  seq-ordered binlog replay, but a file-tail stream can apply a LATE
  (lower-seq) event in a later micro-batch; the export validates both
  invariants (cross-level, base-vs-delta) with small column-pruned jobs
  and, when violated, re-encodes ONLY the delta keys' resolved winners
  as one synthetic level (O(delta keys) write, base stays zero-copy,
  nothing in the lake mutates; ``zero_copy_chain: false`` in the result).

The Avro manifests are produced by the repo's own from-scratch OCF codec
(arc_spark/formats/avro.py) with the spec's field-id annotations.

Scale: the export is O(#files) driver-side metadata + one Spark job over
the resolved tombstoned keys and one tiny job per outstanding delta
level (key columns of small delta files only). Verification story in
tests/test_iceberg_export (no Iceberg runtime ships in this sandbox —
the round-trip is proved by re-reading the metadata chain with our own
Avro/JSON readers and replaying the spec's scan semantics against
``table.read``, plus the hash-exact ``iceberg_round_trip`` oracle query).

Reference note: the reference engine (tripl-ai/arc) has no table format
of its own — this closes the gap between the engine-specific manifest log
and the ecosystem standard the north rule names.
"""

from __future__ import annotations

import json
import re
import time
import uuid

from pyspark.sql import functions as F
from pyspark.sql import types as T

from arc_spark.fs import get_fs, join as fs_join
from arc_spark.formats.avro import write_ocf_bytes

# ---------------------------------------------------------------------------
# schema mapping: Spark -> Iceberg JSON types with assigned field ids
# ---------------------------------------------------------------------------

_PRIMS = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.ByteType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.BinaryType: "binary",
    T.DateType: "date",
    T.TimestampType: "timestamptz",  # Spark TimestampType is tz-normalized
    T.TimestampNTZType: "timestamp",
}


def _iceberg_type(dt, alloc):
    """Spark type -> Iceberg JSON type; ``alloc()`` hands out field ids
    (spec: every nested field, list element and map key/value has one)."""
    if type(dt) in _PRIMS:
        return _PRIMS[type(dt)]
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, T.ArrayType):
        eid = alloc()
        return {
            "type": "list", "element-id": eid,
            "element": _iceberg_type(dt.elementType, alloc),
            "element-required": not dt.containsNull,
        }
    if isinstance(dt, T.MapType):
        kid, vid = alloc(), alloc()
        return {
            "type": "map", "key-id": kid,
            "key": _iceberg_type(dt.keyType, alloc),
            "value-id": vid, "value": _iceberg_type(dt.valueType, alloc),
            "value-required": not dt.valueContainsNull,
        }
    if isinstance(dt, T.StructType):
        fields = []
        for f in dt.fields:
            fid = alloc()
            fields.append({
                "id": fid, "name": f.name, "required": not f.nullable,
                "type": _iceberg_type(f.dataType, alloc),
            })
        return {"type": "struct", "fields": fields}
    raise ValueError(f"no Iceberg mapping for Spark type {dt.simpleString()}")


def _build_schema(struct: T.StructType, renames: dict[str, list[str]]):
    """(iceberg schema json, name-mapping json, name->field-id). Top-level
    ids are assigned first (1..N) so key equality_ids are stable; nested
    ids follow. ``renames``: current name -> historical names still
    present in older data files — mapped as extra names on the same id."""
    counter = {"n": len(struct.fields)}

    def alloc():
        counter["n"] += 1
        return counter["n"]

    fields, mapping, ids = [], [], {}
    for i, f in enumerate(struct.fields, start=1):
        ids[f.name] = i
        fields.append({
            "id": i, "name": f.name, "required": not f.nullable,
            "type": _iceberg_type(f.dataType, alloc),
        })
        names = [f.name, *renames.get(f.name, [])]
        entry = {"field-id": i, "names": names}
        nested = _name_mapping_children(f.dataType, fields[-1]["type"])
        if nested:
            entry["fields"] = nested
        mapping.append(entry)
    schema = {"type": "struct", "schema-id": 0, "fields": fields}
    return schema, mapping, ids, counter["n"]


def _name_mapping_children(dt, ice_type):
    """Nested name-mapping entries mirroring the assigned ids."""
    if isinstance(dt, T.StructType):
        out = []
        for f, jf in zip(dt.fields, ice_type["fields"]):
            e = {"field-id": jf["id"], "names": [f.name]}
            kids = _name_mapping_children(f.dataType, jf["type"])
            if kids:
                e["fields"] = kids
            out.append(e)
        return out
    if isinstance(dt, T.ArrayType):
        e = {"field-id": ice_type["element-id"], "names": ["element"]}
        kids = _name_mapping_children(dt.elementType, ice_type["element"])
        if kids:
            e["fields"] = kids
        return [e]
    if isinstance(dt, T.MapType):
        k = {"field-id": ice_type["key-id"], "names": ["key"]}
        v = {"field-id": ice_type["value-id"], "names": ["value"]}
        kids = _name_mapping_children(dt.valueType, ice_type["value"])
        if kids:
            v["fields"] = kids
        return [k, v]
    return []


# ---------------------------------------------------------------------------
# Iceberg Avro schemas (field ids per the spec's manifest tables)
# ---------------------------------------------------------------------------

def _opt(t):
    return ["null", t]


def _bounds_field(name: str, fid: int, kid: int, vid: int):
    """An optional Iceberg bounds map (``lower_bounds``/``upper_bounds``):
    per the spec, Avro encodes map<int, bytes> as an array of key/value
    records with ``logicalType: map``."""
    return {
        "name": name, "field-id": fid, "default": None,
        "type": _opt({
            "type": "array", "logicalType": "map",
            "items": {
                "type": "record", "name": f"k{kid}_v{vid}",
                "fields": [
                    {"name": "key", "type": "int", "field-id": kid},
                    {"name": "value", "type": "bytes", "field-id": vid},
                ],
            },
        }),
    }


def _data_file_schema():
    return {
        "type": "record", "name": "r2", "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition", "field-id": 102,
             "type": {"type": "record", "name": "r102", "fields": []}},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            _bounds_field("lower_bounds", 125, 126, 127),
            _bounds_field("upper_bounds", 128, 129, 130),
            {"name": "equality_ids", "field-id": 135, "default": None,
             "type": _opt({"type": "array", "items": "int",
                           "element-id": 136})},
        ],
    }


def _manifest_entry_schema():
    return {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": _opt("long"), "field-id": 1,
             "default": None},
            {"name": "sequence_number", "type": _opt("long"), "field-id": 3,
             "default": None},
            {"name": "file_sequence_number", "type": _opt("long"),
             "field-id": 4, "default": None},
            {"name": "data_file", "type": _data_file_schema(), "field-id": 2},
        ],
    }


def _manifest_file_schema():
    return {
        "type": "record", "name": "manifest_file", "fields": [
            {"name": "manifest_path", "type": "string", "field-id": 500},
            {"name": "manifest_length", "type": "long", "field-id": 501},
            {"name": "partition_spec_id", "type": "int", "field-id": 502},
            {"name": "content", "type": "int", "field-id": 517},
            {"name": "sequence_number", "type": "long", "field-id": 515},
            {"name": "min_sequence_number", "type": "long", "field-id": 516},
            {"name": "added_snapshot_id", "type": "long", "field-id": 503},
            {"name": "added_files_count", "type": "int", "field-id": 504},
            {"name": "existing_files_count", "type": "int", "field-id": 505},
            {"name": "deleted_files_count", "type": "int", "field-id": 506},
            {"name": "added_rows_count", "type": "long", "field-id": 512},
            {"name": "existing_rows_count", "type": "long", "field-id": 513},
            {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        ],
    }


# ---------------------------------------------------------------------------
# the export
# ---------------------------------------------------------------------------

def export_iceberg(
    spark, table, *, version: int | None = None, _retry: int = 0
) -> dict:
    """Write Iceberg v2 metadata for ``table``'s snapshot (current by
    default) next to its data. Returns a summary dict (metadata path,
    data/delete file counts, row counts). See module docstring."""
    snap = table.snapshot(version)
    fs = table.fs
    root = table.root
    meta_dir = fs_join(root, "metadata")
    fs.mkdirs(meta_dir)

    # Repeated exports APPEND a snapshot to the existing metadata chain
    # (v2, v3, ... metadata files) so Iceberg readers get real history /
    # time travel — each export's manifests enumerate the FULL current
    # file set (an "overwrite"-shaped snapshot), and older snapshots stay
    # readable until the lake's own expire_snapshots removes their files.
    prev, prev_path = None, None
    try:
        from arc_spark.lake.iceberg_read import resolve_metadata_file

        # writers append to the true head, never a stale hint
        prev_path = resolve_metadata_file(fs, root, prefer_hint=False)
        prev = json.loads(fs.read_bytes(prev_path))
    except (FileNotFoundError, ValueError):
        pass

    schema_json, name_mapping, ids, last_col_id = _build_schema(
        snap.schema, snap.column_renames
    )
    now_ms = int(time.time() * 1000)
    if prev:
        out_version = int(
            re.match(r".*v(\d+)\.metadata\.json$", prev_path).group(1)
        ) + 1
        base_seq = int(prev.get("last-sequence-number", 0))
        snapshot_id = max(
            (s["snapshot-id"] for s in prev.get("snapshots", [])), default=0
        ) + 1
        now_ms = max(now_ms, int(prev.get("last-updated-ms", 0)) + 1)
    else:
        out_version, base_seq = 1, 0
        snapshot_id = snap.version + 1

    # the uid names this ATTEMPT's manifest avros and re-encode/delete
    # data dirs. It must be unique per attempt, not deterministic per
    # (root, version): two concurrent exporters racing from the same
    # prev would otherwise write the SAME paths with plain write_bytes
    # and Spark overwrite-writes — the winner's committed snapshot could
    # end up pointing at the loser's content, which no metadata CAS can
    # undo. Iceberg's own commit UUID plays this role; a loser's files
    # really are orphans (distinct paths) the next expire reaps.
    uid = f"{out_version}-{uuid.uuid4().hex[:16]}"

    def _key_exprs(df):
        # metadata-only renames: parquet still carries historical names —
        # resolve each column through its name history (the same
        # coalescing LakeTable.read does), emitting the CURRENT name so
        # delete-file columns match the exported schema
        exprs = []
        for k in snap.key_cols:
            present = [n for n in [k, *snap.column_renames.get(k, [])]
                       if n in df.columns]
            exprs.append(F.coalesce(*[F.col(n) for n in present]).alias(k))
        return exprs

    def _seq_expr(df):
        present = [n for n in
                   [snap.seq_col, *snap.column_renames.get(snap.seq_col, [])]
                   if n in df.columns]
        return F.coalesce(*[F.col(n) for n in present])

    # MOR delta chains -> sequence-number levels (module docstring):
    # level j = the j-th delta file in its bucket's chronological chain
    # (keys never cross buckets, so per-bucket positions compose into
    # global levels without any epoch bookkeeping)
    delta_levels: dict[int, list[str]] = {}
    for bucket in sorted(snap.delta_files, key=int):
        for j, rel in enumerate(snap.delta_files[bucket], start=1):
            delta_levels.setdefault(j, []).append(fs_join(root, rel))
    n_levels = max(delta_levels, default=0)
    resolved = None
    dead_keys = None  # keys whose resolved row is a tombstone
    stats = None
    zero_copy_chain = True

    from arc_spark.lake.table import TOMBSTONE_COL

    def _pruned(paths: list[str], lvl) -> "DataFrame":
        raw = spark.read.option("mergeSchema", "true").parquet(*paths)
        return raw.select(
            *_key_exprs(raw),
            _seq_expr(raw).alias("_seq"),
            F.coalesce(F.col(TOMBSTONE_COL), F.lit(False)).alias("_tomb"),
            lvl.alias("_lvl"),
        )

    if n_levels:
        # The level encoding is valid ONLY when per-key seq order matches
        # chain order: a seq-ordered binlog replay guarantees this, but a
        # file-tail stream can apply a LATE (lower-seq) event in a LATER
        # micro-batch — level j's equality delete would then kill the
        # true winner below it. ONE column-pruned aggregation over
        # (key, seq, tombstone, level) checks both invariants (cross-
        # level order AND base-vs-delta order: the top-level row must
        # carry the key's max seq) and simultaneously yields the
        # resolved-tombstone key set the final delete needs — no
        # full-row shuffle, no separate window pass.
        lv = None
        for j in sorted(delta_levels):
            d = _pruned(delta_levels[j], F.lit(j))
            lv = d if lv is None else lv.unionByName(d)
        allk = lv
        base_paths = [
            fs_join(root, rel) for b in snap.files for rel in snap.files[b]
        ]
        if base_paths:
            allk = _pruned(base_paths, F.lit(0)).unionByName(lv)
        from pyspark import StorageLevel

        stats = (
            allk.groupBy(*snap.key_cols)
            .agg(
                F.max("_seq").alias("_win_seq"),
                F.max_by("_tomb", "_seq").alias("_win_tomb"),
                F.max_by("_seq", "_lvl").alias("_top_seq"),
                F.max("_lvl").alias("_max_lvl"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK_DESER)
        )
        zero_copy_chain = stats.filter(
            (F.col("_max_lvl") > 0)
            & (F.col("_top_seq") != F.col("_win_seq"))
        ).isEmpty()
        dead_keys = stats.filter(F.col("_win_tomb")).select(*snap.key_cols)
        if not zero_copy_chain:
            # Out-of-order chain: re-encode ONLY the delta keys' resolved
            # winners as a single synthetic level (base stays zero-copy;
            # the write is O(delta keys), far cheaper than compaction and
            # mutates nothing in the lake). The level-1 equality delete
            # (derived from this file's keys) kills every base version;
            # keys whose resolved row is a tombstone are excluded here
            # and die via the top-sequence tombstone delete instead.
            resolved = table._resolve(spark, snap)
            winners = resolved.join(
                lv.select(*snap.key_cols).distinct(), snap.key_cols,
                "leftsemi",
            )
            live = winners.filter(
                ~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False))
            ).drop(TOMBSTONE_COL)
            reenc_dir = fs_join(root, "data", f"iceberg-reencode-{uid}")
            live.write.mode("overwrite").parquet(reenc_dir)
            delta_levels = {1: [
                fs_join(reenc_dir, name) for name in fs.listdir(reenc_dir)
                if name.endswith(".parquet")
            ]}
            n_levels = 1

    seq_data = base_seq + 1  # base files; delta level j at seq_data + j
    seq_del = seq_data + n_levels + 1  # top: resolved-tombstone delete

    # -- data manifest: every base + delta file, footer-counted, in place
    # (footer reads are IO-bound and independent — the pooled helper
    # keeps a many-hundred-file MOR export off the serial driver path)
    file_seqs = [
        (fs_join(root, rel), seq_data)
        for bucket in sorted(snap.files, key=int)
        for rel in snap.files[bucket]
    ] + [
        (path, seq_data + j)
        for j in sorted(delta_levels) for path in delta_levels[j]
    ]

    fstats = _pooled_stats_bounds(fs, [p for p, _ in file_seqs], snap.seq_col)
    seq_fid = ids[snap.seq_col]
    entries, total_rows = [], 0
    for (path, seq), (n, size, bnd) in zip(file_seqs, fstats):
        total_rows += n
        entries.append({
            "status": 1,  # ADDED
            "snapshot_id": snapshot_id,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": 0,  # DATA
                "file_path": path,
                "file_format": "PARQUET",
                "partition": {},
                "record_count": n,
                "file_size_in_bytes": size,
                # seq-column bounds from the same footer read: Iceberg
                # engines use these for scan planning (min/max pruning),
                # exactly as the lake's own file_stats do internally
                "lower_bounds": _seq_bound_cell(seq_fid, bnd, 0),
                "upper_bounds": _seq_bound_cell(seq_fid, bnd, 1),
                "equality_ids": None,
            },
        })

    manifest_meta = {
        "schema": json.dumps(schema_json),
        "schema-id": "0",
        "partition-spec": "[]",
        "partition-spec-id": "0",
        "format-version": "2",
    }
    data_manifest = fs_join(meta_dir, f"manifest-data-{uid}.avro")
    fs.write_bytes(
        data_manifest,
        write_ocf_bytes(
            _manifest_entry_schema(), entries, codec="null",
            extra_meta={**manifest_meta, "content": "data"},
        ),
    )
    manifests = [{
        "manifest_path": data_manifest,
        "manifest_length": fs.size(data_manifest),
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": seq_data + n_levels,
        "min_sequence_number": seq_data,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(entries),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": total_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }]

    # -- equality deletes: per-level key kills + resolved tombstones -----
    del_entries, del_counts = [], {}

    def _del_entry(path: str, seq: int, label: str) -> None:
        n, size = _footer_stats(fs, path)
        if not n:
            return
        del_counts[label] = del_counts.get(label, 0) + n
        del_entries.append({
            "status": 1,
            "snapshot_id": snapshot_id,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": 2,  # EQUALITY_DELETES
                "file_path": path,
                "file_format": "PARQUET",
                "partition": {},
                "record_count": n,
                "file_size_in_bytes": size,
                "equality_ids": [ids[k] for k in snap.key_cols],
            },
        })

    if n_levels:
        # ALL keys present in level j — kills every older version of
        # those keys (base + levels < j); the level's own rows survive
        # the strictly-smaller rule at the same sequence number. ONE
        # level-partitioned write produces every level's delete file —
        # a job per level made job overhead dominate long-chain exports.
        src = lv if zero_copy_chain else (
            lv.select(*snap.key_cols).distinct().withColumn(
                "_lvl", F.lit(1)
            )
        )
        keys_dir = fs_join(root, "data", f"iceberg-deletes-{uid}-levels")
        (
            src.select(*snap.key_cols, "_lvl")
            .repartition("_lvl")
            .write.mode("overwrite")
            .partitionBy("_lvl")
            .parquet(keys_dir)
        )
        for entry in sorted(fs.listdir(keys_dir)):
            if not entry.startswith("_lvl="):
                continue
            j = int(entry.split("=", 1)[1])
            for fn in fs.listdir(fs_join(keys_dir, entry)):
                if fn.endswith(".parquet"):
                    _del_entry(fs_join(keys_dir, entry, fn),
                               seq_data + j, f"level{j}")
    if entries:
        # keys whose RESOLVED (max-seq) row is a tombstone: the only
        # tombstone rows the per-level key deletes leave standing. With
        # MOR levels these come from the pruned stats aggregation above;
        # a compacted table takes the no-shuffle clean-read path.
        if dead_keys is not None:
            dead = dead_keys
        else:
            if resolved is None:
                resolved = table._resolve(spark, snap)
            dead = resolved.filter(F.col(TOMBSTONE_COL)).select(*snap.key_cols)
        tomb_dir = fs_join(root, "data", f"iceberg-deletes-{uid}-tombstones")
        dead.coalesce(1).write.mode("overwrite").parquet(tomb_dir)
        for fn in fs.listdir(tomb_dir):
            if fn.endswith(".parquet"):
                _del_entry(fs_join(tomb_dir, fn), seq_del, "tombstones")
        if "tombstones" not in del_counts:  # nothing tombstoned — drop it
            fs.rmtree(tomb_dir)
    if del_entries:
        del_manifest = fs_join(meta_dir, f"manifest-deletes-{uid}.avro")
        fs.write_bytes(
            del_manifest,
            write_ocf_bytes(
                _manifest_entry_schema(), del_entries, codec="null",
                extra_meta={**manifest_meta, "content": "deletes"},
            ),
        )
        manifests.append({
            "manifest_path": del_manifest,
            "manifest_length": fs.size(del_manifest),
            "partition_spec_id": 0,
            "content": 1,  # DELETES
            "sequence_number": seq_del,
            "min_sequence_number": min(
                e["sequence_number"] for e in del_entries
            ),
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(del_entries),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": sum(del_counts.values()),
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        })

    manifest_list = fs_join(meta_dir, f"snap-{snapshot_id}-{uid}.avro")
    fs.write_bytes(
        manifest_list,
        write_ocf_bytes(
            _manifest_file_schema(), manifests, codec="null",
            extra_meta={
                "snapshot-id": str(snapshot_id),
                "sequence-number": str(seq_del),
                "format-version": "2",
            },
        ),
    )

    # schema history: reuse the prior schema-id when unchanged, else
    # append with the next id (positional field ids are stable for the
    # lake's additive evolution; see module docstring)
    schemas, schema_id = _schema_history(prev, schema_json)

    new_snapshot = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": now_ms,
        "sequence-number": seq_del,
        "summary": {
            # each export enumerates the FULL current file set
            "operation": "overwrite" if prev else "append",
            "added-data-files": str(len(entries)),
            "added-records": str(total_rows),
        },
        "manifest-list": manifest_list,
        "schema-id": schema_id,
    }
    metadata = {
        "format-version": 2,
        # the table identity must be STABLE across exports
        "table-uuid": prev["table-uuid"] if prev else str(
            uuid.uuid5(uuid.NAMESPACE_URL, root)
        ),
        "location": root,
        "last-sequence-number": seq_del,
        "last-updated-ms": now_ms,
        "last-column-id": max(
            last_col_id,
            int(prev.get("last-column-id", 0)) if prev else 0,
        ),
        "current-schema-id": schema_id,
        "schemas": schemas,
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {
            "schema.name-mapping.default": json.dumps(name_mapping),
            "write.format.default": "parquet",
            # provenance breadcrumbs for operators
            "arc-spark.lake.version": str(snap.version),
            "arc-spark.lake.end-seq": str(snap.end_seq or 0),
        },
        "current-snapshot-id": snapshot_id,
        "refs": {"main": {"snapshot-id": snapshot_id, "type": "branch"}},
        "snapshots": [*(prev.get("snapshots", []) if prev else []),
                      new_snapshot],
        "snapshot-log": [
            *(prev.get("snapshot-log", []) if prev else []),
            {"snapshot-id": snapshot_id, "timestamp-ms": now_ms},
        ],
        "metadata-log": [
            *(prev.get("metadata-log", []) if prev else []),
            *([{"metadata-file": prev_path,
                "timestamp-ms": int(prev.get("last-updated-ms", 0))}]
              if prev else []),
        ],
    }
    # CAS commit (same discipline as the lake's manifest commits): two
    # concurrent exporters would mint the SAME snapshot-id/sequence
    # numbers from the same prev — the loser must re-read the winner's
    # metadata and re-derive, not clobber. With the table's CommitLocker
    # the check-then-put (and the hint update) serialize on ANY backend;
    # without one, create_exclusive detects the race where the fs CAS is
    # honest (POSIX, HDFS, native S3 conditional PUT) and the Hadoop-
    # connector object-store caveat is the lake's own, warned once there.
    # Either way the loser retries: the recursion re-reads prev and
    # produces fresh ids (the losing attempt's manifest Avro / delete
    # files are orphans the next expire_snapshots reaps).
    meta_path = fs_join(meta_dir, f"v{out_version}.metadata.json")
    committed = _cas_metadata(
        fs, getattr(table, "locker", None), root, meta_path,
        json.dumps(metadata, indent=2).encode(), out_version,
    )
    if not committed:
        if stats is not None:
            stats.unpersist()  # the retry builds (and persists) a fresh one
        if _retry >= 3:
            raise RuntimeError(
                f"export_iceberg: lost the metadata CAS at {meta_path} "
                "3 times — concurrent exporters are racing faster than "
                "the retry budget"
            )
        return export_iceberg(spark, table, version=version, _retry=_retry + 1)
    tomb_n = del_counts.get("tombstones", 0)
    if stats is not None:
        # with MOR levels the per-level key deletes also kill shadowed
        # versions, so total_rows - delete_rows over-subtracts (a fresh
        # delta insert's key-delete kills nothing); the pruned stats
        # aggregation already knows each key's winner — live rows are
        # the keys whose winner is not a tombstone
        live_rows = stats.filter(~F.col("_win_tomb")).count()
        stats.unpersist()
    else:
        # LWW keeps ONE row per key, so each deleted key's only physical
        # row is its tombstone — the equality delete removes exactly it
        live_rows = total_rows - tomb_n
    return {
        "metadata": meta_path,
        "manifest_list": manifest_list,
        "data_files": len(entries),
        "delete_files": len(del_entries),
        "delta_levels": n_levels,
        # False: the chain was out-of-order (late lower-seq events in a
        # later delta) and the delta keys' winners were re-encoded as one
        # synthetic level — base files still referenced in place
        "zero_copy_chain": zero_copy_chain,
        "physical_rows": total_rows,
        "deleted_keys": tomb_n,
        "delete_rows": sum(del_counts.values()),
        "live_rows": live_rows,
    }


def _footer_stats(fs, path: str) -> tuple[int, int]:
    """(row count, byte size) for one parquet file — a footer read plus
    a stat. Shared by the exporter and the landing-zone writer so the
    manifest stats can never drift between them."""
    n, size, _ = _footer_stats_multi(fs, path, {})
    return n, size


def _seq_bound_cell(field_id: int, bounds, i: int):
    """One Iceberg bounds-map cell for the seq field, or None when the
    footer had no usable stats. Values use the spec's single-value binary
    serialization: long = 8-byte little-endian."""
    if bounds is None:
        return None
    import struct

    return [{"key": field_id, "value": struct.pack("<q", int(bounds[i]))}]


def _footer_stats_bounds(fs, path: str, seq_col: str):
    """(row count, byte size, [min_seq, max_seq] | None) — one footer
    read, shared with the manifest-stats path so nothing drifts."""
    n, size, bnds = _footer_stats_multi(fs, path, {seq_col: None})
    return n, size, bnds.get(seq_col)


def _pooled_stats_bounds(fs, paths, seq_col: str):
    """_footer_stats_bounds over many files on a thread pool."""
    return [
        (n, size, bnds.get(seq_col))
        for n, size, bnds in _pooled_stats_multi(fs, paths, {seq_col: None})
    ]


def _numeric_bound_cols(schema_fields) -> dict:
    """{name: (field-id, iceberg type)} for the top-level int/long fields
    of an Iceberg schema — the columns landing manifests record bounds
    for (seq cursors, timestamps-as-longs; strings would need the spec's
    truncation rules and buy the tail nothing)."""
    return {
        f["name"]: (f["id"], f["type"])
        for f in schema_fields
        if f.get("type") in ("int", "long")
    }


def _pack_bound(val, typ: str) -> bytes:
    """Iceberg single-value serialization for int/long bounds."""
    import struct

    return struct.pack("<i" if typ == "int" else "<q", int(val))


def _bounds_cells(bnds: dict, cols: dict):
    """(lower_bounds, upper_bounds) cell lists for a data_file entry from
    per-column footer bounds; None when no column had usable stats."""
    lo, hi = [], []
    for name, (fid, typ) in cols.items():
        b = bnds.get(name)
        if b is None:
            continue
        lo.append({"key": fid, "value": _pack_bound(b[0], typ)})
        hi.append({"key": fid, "value": _pack_bound(b[1], typ)})
    return (lo or None, hi or None)


def _footer_stats_multi(fs, path: str, cols: dict):
    """(rows, size, {col: [lo, hi]}) — one footer read, bounds for every
    requested numeric column."""
    import pyarrow.parquet as pq

    from arc_spark.lake.table import _footer_seq_bounds

    with fs.seekable_input(path) as f:
        md = pq.ParquetFile(f).metadata
    bnds = {}
    for name in cols:
        b = _footer_seq_bounds(md, name)
        if b is not None:
            bnds[name] = b
    return md.num_rows, fs.size(path), bnds


def _pooled_stats_multi(fs, paths, cols: dict):
    """_footer_stats_multi over many files on a thread pool."""
    from concurrent.futures import ThreadPoolExecutor

    paths = list(paths)
    if not paths:
        return []
    with ThreadPoolExecutor(max_workers=16) as pool:
        return list(pool.map(lambda p: _footer_stats_multi(fs, p, cols), paths))


def _pooled_stats(fs, paths) -> list[tuple[int, int]]:
    """_footer_stats over many files on a thread pool — the reads are
    IO-bound and independent, so a many-hundred-file commit never walks
    object-store footers serially on the driver."""
    return [(n, size) for n, size, _ in _pooled_stats_multi(fs, paths, {})]


def _schema_history(prev: dict | None, schema_json: dict):
    """(schemas, schema_id): reuse the matching schema-id from the
    previous metadata's history when the body is unchanged, else mint
    the next id and append — Iceberg's schema-evolution bookkeeping,
    shared by the exporter and the landing-zone writer."""
    if not prev:
        return [schema_json], 0
    schemas = list(prev.get("schemas") or [])
    if not schemas:
        return [schema_json], 0

    def _body(s):
        return json.dumps({k: v for k, v in s.items() if k != "schema-id"},
                          sort_keys=True)

    match = next(
        (s["schema-id"] for s in schemas if _body(s) == _body(schema_json)),
        None,
    )
    if match is not None:
        return schemas, match
    schema_id = max(s["schema-id"] for s in schemas) + 1
    schemas.append({**schema_json, "schema-id": schema_id})
    return schemas, schema_id


def _cas_metadata(fs, locker, root: str, meta_path: str, payload: bytes,
                  out_version: int) -> bool:
    """Atomically publish an Iceberg metadata version + advance the hint.

    Returns False when the version already exists (the caller lost the
    race and must re-derive against the winner's chain). With a
    CommitLocker the check-then-put AND the hint update serialize on any
    backend; without one, ``create_exclusive`` is the CAS (atomic on
    POSIX/HDFS/native-S3; the Hadoop-connector object-store caveat is
    shared with — and warned by — the lake's own manifest commit) and
    the hint update is best-effort: it writes the HIGHEST existing
    version (verify-and-repair once after writing, narrowing the
    list-then-write race to a single re-list). Correctness never rests
    on the hint — resolve_metadata_file treats it as advisory and never
    serves a hint below the newest listed version."""
    meta_dir = meta_path.rsplit("/", 1)[0]
    hint_path = fs_join(meta_dir, "version-hint.text")
    if locker is not None:
        token = locker.acquire(fs_join(root, "_iceberg_commit"))
        try:
            if fs.exists(meta_path):
                return False
            fs.write_bytes(meta_path, payload)
            fs.write_bytes(hint_path, str(out_version).encode())
            return True
        finally:
            locker.release(fs_join(root, "_iceberg_commit"), token)
    try:
        fs.create_exclusive(meta_path, payload)
    except FileExistsError:
        return False

    def _highest() -> int:
        h = out_version
        for name in fs.listdir(meta_dir):
            m = re.match(r"v(\d+)\.metadata\.json$", name)
            if m:
                h = max(h, int(m.group(1)))
        return h

    # The list-then-write is a TOCTOU (a newer winner can commit + write
    # its hint between our listdir and our write, and our write would
    # regress it), so verify-and-repair once after writing: re-list and,
    # if a newer version appeared, advance the hint to it. The residual
    # window is one re-list wide — and harmless, because readers treat
    # the hint as advisory (resolve_metadata_file never trusts a hint
    # below the newest listed version).
    wrote = _highest()
    fs.write_bytes(hint_path, str(wrote).encode())
    healed = _highest()
    if healed > wrote:
        fs.write_bytes(hint_path, str(healed).encode())
    return True


# ---------------------------------------------------------------------------
# GC coordination with the lake's expire_snapshots
# ---------------------------------------------------------------------------

def expire_iceberg_snapshots(fs, root: str, live_rel: set[str], *,
                             locker=None, _retry: int = 0):
    """Reconcile the exported Iceberg metadata chain with a lake GC pass.

    ``live_rel`` is the set of ROOT-relative parquet paths the surviving
    lake manifests still reference. Exported Iceberg snapshots reference
    lake parquet in place, so a snapshot whose data files are about to be
    garbage-collected would dangle for Iceberg readers; and the export's
    own equality-delete parquets live under ``data/`` where the lake GC
    walk would otherwise reap them while they are still referenced.

    Returns None when the table has no Iceberg export. Otherwise returns
    ``{"keep_files": set[str], "snapshots_kept": int,
    "snapshots_dropped": int, "mirror_removed": bool}`` where keep_files
    are root-relative paths the GC walk must treat as live (surviving
    snapshots' delete files). Side effects, mirroring Iceberg's own
    expire_snapshots semantics:

    - snapshots whose data files are all still live SURVIVE untouched;
    - snapshots referencing any GC'd file are dropped from a NEW metadata
      version (snapshot-log filtered, current-snapshot-id/refs moved to
      the newest survivor) — old v*.metadata.json files stay on disk, as
      real Iceberg leaves them;
    - manifest-list / manifest Avro files referenced by no surviving
      snapshot are deleted, as are orphaned ones from crashed or
      CAS-losing exports. Like the lake GC that calls this, the reap
      assumes no export is mid-flight (the standard GC-vs-writer
      discipline: maintenance owns the table while it runs);
    - if NO snapshot survives, the whole ``metadata`` directory is
      removed (the mirror must be re-published with export_iceberg) and
      ``mirror_removed`` is True.
    """
    from arc_spark.formats.avro import read_ocf_bytes
    from arc_spark.lake.iceberg_read import resolve_metadata_file

    meta_dir = fs_join(root, "metadata")
    try:
        meta_path = resolve_metadata_file(fs, root, prefer_hint=False)
    except (FileNotFoundError, ValueError):
        return None
    meta = json.loads(fs.read_bytes(meta_path))

    def rel(p: str) -> str:
        return p[len(root):].lstrip("/") if p.startswith(root) else p

    surviving, keep_files, keep_avro = [], set(), set()
    for s in meta.get("snapshots", []):
        try:
            _, manifests = read_ocf_bytes(fs.read_bytes(s["manifest-list"]))
        except FileNotFoundError:
            continue  # already half-expired: drop it
        ok, own_rel, avros = True, [], [s["manifest-list"]]
        for m in manifests:
            avros.append(m["manifest_path"])
            _, entries = read_ocf_bytes(fs.read_bytes(m["manifest_path"]))
            for e in entries:
                r = rel(e["data_file"]["file_path"])
                if (
                    e["data_file"].get("content", 0) == 0
                    and not r.startswith("data/iceberg-")
                ):
                    # a LAKE parquet referenced in place: the snapshot
                    # survives iff the lake GC keeps it
                    if r not in live_rel:
                        ok = False
                else:
                    # EXPORT-OWNED file (equality deletes, re-encoded
                    # delta winners): it lives in no lake manifest by
                    # construction — it survives exactly as long as its
                    # snapshot does, so it must never vote against it
                    own_rel.append(r)
        if ok:
            surviving.append(s)
            keep_files |= set(own_rel)
            keep_avro |= {a.rsplit("/", 1)[-1] for a in avros}

    dropped = len(meta.get("snapshots", [])) - len(surviving)
    if not surviving:
        fs.rmtree(meta_dir)
        return {"keep_files": set(), "snapshots_kept": 0,
                "snapshots_dropped": dropped, "mirror_removed": True}

    if dropped:
        cur = max(surviving, key=lambda s: s.get("sequence-number", 0))
        keep_ids = {s["snapshot-id"] for s in surviving}
        m = re.match(r".*v(\d+)\.metadata\.json$", meta_path)
        out_version = int(m.group(1)) + 1
        now_ms = max(
            int(time.time() * 1000), int(meta.get("last-updated-ms", 0)) + 1
        )
        new_meta = {
            **meta,
            "last-updated-ms": now_ms,
            "current-snapshot-id": cur["snapshot-id"],
            "refs": {"main": {"snapshot-id": cur["snapshot-id"],
                              "type": "branch"}},
            "snapshots": surviving,
            "snapshot-log": [
                e for e in meta.get("snapshot-log", [])
                if e["snapshot-id"] in keep_ids
            ],
            "metadata-log": [
                *meta.get("metadata-log", []),
                {"metadata-file": meta_path,
                 "timestamp-ms": int(meta.get("last-updated-ms", 0))},
            ],
        }
        # CAS: a concurrent export may have landed this version — its
        # metadata references snapshots our filtering never saw, so
        # redo the reconciliation against the new chain instead of
        # clobbering it
        committed = _cas_metadata(
            fs, locker, root,
            fs_join(meta_dir, f"v{out_version}.metadata.json"),
            json.dumps(new_meta, indent=2).encode(), out_version,
        )
        if not committed:
            if _retry >= 3:
                raise RuntimeError(
                    f"expire_iceberg_snapshots: lost the metadata CAS at "
                    f"{meta_dir} v{out_version} 3 times"
                )
            return expire_iceberg_snapshots(
                fs, root, live_rel, locker=locker, _retry=_retry + 1
            )
    # reap manifest-list/manifest Avro of dropped (or orphaned) snapshots
    for name in fs.listdir(meta_dir):
        if name.endswith(".avro") and name not in keep_avro:
            fs.delete(fs_join(meta_dir, name))
    return {"keep_files": keep_files, "snapshots_kept": len(surviving),
            "snapshots_dropped": dropped, "mirror_removed": False}


def export_catalog_iceberg(spark, catalog, *, version: int | None = None) -> dict:
    """Publish every table of a :class:`~arc_spark.lake.catalog.LakeCatalog`
    as an Apache Iceberg table — the catalog root becomes a HadoopCatalog
    WAREHOUSE (each member table directory is a self-contained Iceberg
    table with its own ``metadata/`` chain). Every table exports at the
    version PINNED by the chosen catalog snapshot, so the published set
    is the last atomic epoch the catalog committed — never a torn mix
    with later in-flight table writes. Per-table exports append to each
    table's own Iceberg history as usual."""
    snap = catalog.snapshot(version)
    tables = {}
    for name in sorted(snap.tables):
        t = catalog.table(name, version=version)
        tables[name] = export_iceberg(
            spark, t, version=snap.table_version(name)
        )
    return {
        "catalog_version": snap.version,
        "epoch": snap.epoch,
        "tables": tables,
    }


def write_iceberg(spark, df, root: str, *, mode: str = "append",
                  _retry: int = 0, _batch_dir: str | None = None) -> dict:
    """Land a plain DataFrame as (or append a snapshot to) an Apache
    Iceberg v2 table at ``root`` — the minimal landing-zone writer.

    This is the inbound half of the event-stream story: a connector
    (e.g. parsed Debezium envelopes) lands batches here and the replay
    tails the table with ``events_format='iceberg'`` — resume stays the
    seq cursor, so the landing zone needs no offset bookkeeping of its
    own. ``mode='append'`` adds this batch's files to the previous
    snapshot's file set (a real Iceberg append); ``mode='overwrite'``
    starts the table over with only this batch. The metadata chain,
    name mapping, CAS commit and snapshot history follow the same code
    paths the lake exporter uses, so everything ``read_iceberg`` / any
    spec-compliant reader supports (time travel, schema-id reuse) holds
    here too. No deletes are ever written — a landing zone is
    append-only by design; use a LakeTable when you need upserts."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append/overwrite, got {mode!r}")
    fs = get_fs(root, spark)
    meta_dir = fs_join(root, "metadata")
    fs.mkdirs(meta_dir)

    prev, prev_path = None, None
    try:
        from arc_spark.lake.iceberg_read import (
            _load_snapshot_files,
            resolve_metadata_file,
        )

        prev_path = resolve_metadata_file(fs, root, prefer_hint=False)
        prev = json.loads(fs.read_bytes(prev_path))
    except (FileNotFoundError, ValueError):
        pass

    if prev:
        m = re.match(r".*v(\d+)\.metadata\.json$", prev_path)
        out_version = int(m.group(1)) + 1
        base_seq = int(prev.get("last-sequence-number", 0))
        snapshot_id = max(
            (s["snapshot-id"] for s in prev.get("snapshots", [])), default=0
        ) + 1
        now_ms = max(int(time.time() * 1000),
                     int(prev.get("last-updated-ms", 0)) + 1)
    else:
        out_version, base_seq, snapshot_id = 1, 0, 1
        now_ms = int(time.time() * 1000)
    seq = base_seq + 1

    # Carry the previous snapshot's live files forward at their original
    # data sequence numbers (a true append — old files are EXISTING),
    # with record counts / sizes / adding-snapshot ids straight from the
    # previous manifest: an append is O(this batch) footer IO, not
    # O(table files), and entry snapshot_id keeps meaning "snapshot that
    # ADDED the file" (Iceberg v2 spec) for provenance tooling.
    # Validated BEFORE any batch write so a refused call (a table with
    # delete files belongs to an upsert writer) leaves no orphans inside
    # the foreign table's data directory.
    carried = []
    if prev and mode == "append" and prev.get("current-snapshot-id") is not None:
        data_files, deletes = _load_snapshot_files(
            fs, prev, with_stats=True, with_bounds=True
        )
        if deletes:
            raise ValueError(
                "write_iceberg appends to append-only tables; this table "
                "carries delete files — it belongs to an upsert writer"
            )
        carried = data_files

    # a CAS-loss retry reuses the already-written batch files — only the
    # metadata derivation repeats
    batch_dir = _batch_dir
    if batch_dir is None:
        batch_dir = fs_join(root, "data", f"append-{uuid.uuid4().hex[:12]}")
        df.write.mode("overwrite").parquet(batch_dir)
    new_files = [
        fs_join(batch_dir, name) for name in fs.listdir(batch_dir)
        if name.endswith(".parquet")
    ]

    schema_json, name_mapping, _ids, last_col_id = _build_schema(
        df.schema, {}
    )
    # per-ATTEMPT uid (see export_iceberg): concurrent writers racing
    # from the same prev must never share manifest avro paths
    uid = f"w{out_version}-{uuid.uuid4().hex[:16]}"

    # foreign manifests may omit stats; fill from footers in one pool
    need = [c[0] for c in carried if c[2] is None or c[3] is None]
    if need:
        fixed = dict(zip(need, _pooled_stats(fs, need)))
        carried = [
            (p, s, *(fixed[p] if p in fixed else (n, sz)), a, b)
            for p, s, n, sz, a, b in carried
        ]

    num_cols = _numeric_bound_cols(schema_json["fields"])
    entries, total_rows, new_rows = [], 0, 0
    for path, fseq, n, size, added_by, (lo_b, hi_b) in carried:  # EXISTING
        total_rows += n
        entries.append({
            "status": 0,
            "snapshot_id": added_by if added_by is not None else snapshot_id,
            "sequence_number": fseq,
            "file_sequence_number": fseq,
            "data_file": {
                "content": 0, "file_path": path, "file_format": "PARQUET",
                "partition": {}, "record_count": n,
                "file_size_in_bytes": size,
                # bounds pass through verbatim — an append must not erode
                # older files' scan-pruning metadata
                "lower_bounds": lo_b, "upper_bounds": hi_b,
                "equality_ids": None,
            },
        })
    new_stats = list(zip(new_files, _pooled_stats_multi(fs, new_files, num_cols)))
    # Empty partitions write zero-row parquet files (a filtered or skewed
    # upstream frame); manifesting them pollutes every future append's
    # carried list and defeats bounds pruning (no footer stats -> read
    # conservatively). Drop them from BOTH the manifest and the disk.
    for path, (n, _sz, _b) in new_stats:
        if n == 0:
            fs.delete(path)
    new_stats = [t for t in new_stats if t[1][0] > 0]
    new_files = [t[0] for t in new_stats]
    for path, (n, size, bnds) in new_stats:
        total_rows += n
        new_rows += n
        lo_b, hi_b = _bounds_cells(bnds, num_cols)
        entries.append({
            "status": 1,  # ADDED
            "snapshot_id": snapshot_id,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": 0, "file_path": path, "file_format": "PARQUET",
                "partition": {}, "record_count": n,
                "file_size_in_bytes": size,
                # int/long column bounds from the same footer read — this
                # is what lets a seq-cursor tail skip caught-up files
                "lower_bounds": lo_b, "upper_bounds": hi_b,
                "equality_ids": None,
            },
        })

    schemas, schema_id = _schema_history(prev, schema_json)
    meta_path, manifest_list = _publish_landing_snapshot(
        fs, root,
        prev=prev, prev_path=prev_path, uid=uid, entries=entries,
        seq=seq, min_seq=min([c[1] for c in carried] + [seq]),
        snapshot_id=snapshot_id, out_version=out_version, now_ms=now_ms,
        operation="append" if mode == "append" else "overwrite",
        summary={"added-data-files": str(len(new_files)),
                 "added-records": str(new_rows)},
        schemas=schemas, schema_id=schema_id, schema_json=schema_json,
        name_mapping=name_mapping,
        last_col_id=max(
            last_col_id, int(prev.get("last-column-id", 0)) if prev else 0
        ),
        counts=(len(new_files), len(carried), 0,
                new_rows, total_rows - new_rows, 0),
    )
    if meta_path is None:
        if _retry >= 3:
            raise RuntimeError(
                f"write_iceberg: lost the metadata CAS at {root} "
                f"v{out_version} 3 times — concurrent writers are racing "
                "faster than the retry budget"
            )
        # lost the race: re-derive against the winner's chain, keeping
        # this attempt's batch files (they are committed by the retry)
        return write_iceberg(spark, df, root, mode=mode,
                             _retry=_retry + 1, _batch_dir=batch_dir)
    return {
        "metadata": meta_path,
        "manifest_list": manifest_list,
        "data_files": len(entries),
        "added_files": len(new_files),
        "added_rows": new_rows,
        "total_rows": total_rows,
        "snapshot_id": snapshot_id,
    }


def _publish_landing_snapshot(
    fs, root: str, *, prev, prev_path, uid, entries, seq, min_seq,
    snapshot_id, out_version, now_ms, operation, summary, schemas,
    schema_id, schema_json, name_mapping, last_col_id, counts,
):
    """Write one landing-zone snapshot — manifest avro, manifest list,
    metadata JSON — and CAS-commit it. Shared by :func:`write_iceberg`
    (append/overwrite) and :func:`compact_iceberg` (replace) so the two
    writers can never drift on the spec bookkeeping. ``counts`` is
    (added_files, existing_files, deleted_files, added_rows,
    existing_rows, deleted_rows). Returns ``(meta_path, manifest_list)``
    or ``(None, None)`` when the CAS loses — the caller owns the retry
    policy (re-derive against the winner's chain)."""
    meta_dir = fs_join(root, "metadata")
    (n_added, n_existing, n_deleted,
     added_rows, existing_rows, deleted_rows) = counts
    manifest_meta = {
        "schema": json.dumps(schema_json), "schema-id": str(schema_id),
        "partition-spec": "[]", "partition-spec-id": "0",
        "format-version": "2",
    }
    data_manifest = fs_join(meta_dir, f"manifest-data-{uid}.avro")
    fs.write_bytes(
        data_manifest,
        write_ocf_bytes(
            _manifest_entry_schema(), entries, codec="null",
            extra_meta={**manifest_meta, "content": "data"},
        ),
    )
    manifest_list = fs_join(meta_dir, f"snap-{snapshot_id}-{uid}.avro")
    fs.write_bytes(
        manifest_list,
        write_ocf_bytes(
            _manifest_file_schema(),
            [{
                "manifest_path": data_manifest,
                "manifest_length": fs.size(data_manifest),
                "partition_spec_id": 0, "content": 0,
                "sequence_number": seq,
                "min_sequence_number": min_seq,
                "added_snapshot_id": snapshot_id,
                "added_files_count": n_added,
                "existing_files_count": n_existing,
                "deleted_files_count": n_deleted,
                "added_rows_count": added_rows,
                "existing_rows_count": existing_rows,
                "deleted_rows_count": deleted_rows,
            }],
            codec="null",
            extra_meta={"snapshot-id": str(snapshot_id),
                        "sequence-number": str(seq), "format-version": "2"},
        ),
    )
    metadata = {
        "format-version": 2,
        "table-uuid": prev["table-uuid"] if prev else str(
            uuid.uuid5(uuid.NAMESPACE_URL, root)
        ),
        "location": root,
        "last-sequence-number": seq,
        "last-updated-ms": now_ms,
        "last-column-id": last_col_id,
        "current-schema-id": schema_id,
        "schemas": schemas,
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {
            "schema.name-mapping.default": json.dumps(name_mapping),
            "write.format.default": "parquet",
            "commit.retry.num-retries": "1",
            # ATTAINED (not merely conservative) manifest bounds: the
            # Iceberg spec only requires upper_bounds >= the column max,
            # so a metadata-only max_seq probe may treat a bound as the
            # true max ONLY when every commit came from this engine's
            # landing writers (footer-exact bounds). The PROPERTY is just
            # a fast precondition — standard Iceberg writers preserve
            # table properties verbatim across commits, so a foreign
            # append would keep it. The PROOF is per-snapshot: every
            # engine-written snapshot stamps arc.bounds.tight into its
            # summary (below), and max_seq_bound requires the marker on
            # EVERY snapshot in the chain before trusting bounds as
            # attained — a foreign commit lacks the marker and demotes
            # the claim to conservative, exactly the spec default.
            **(
                {"arc.bounds.tight": "true"}
                if prev is None
                or (prev.get("properties") or {}).get("arc.bounds.tight")
                == "true"
                else {}
            ),
        },
        "current-snapshot-id": snapshot_id,
        "refs": {"main": {"snapshot-id": snapshot_id, "type": "branch"}},
        "snapshots": [
            *([s for s in prev.get("snapshots", [])] if prev else []),
            {
                "snapshot-id": snapshot_id,
                "timestamp-ms": now_ms,
                "sequence-number": seq,
                # per-snapshot attained-bounds marker: the evidence the
                # metadata-only max_seq probe requires on EVERY snapshot
                # (a table property alone survives foreign appends)
                "summary": {
                    "operation": operation,
                    "arc.bounds.tight": "true",
                    **summary,
                },
                "manifest-list": manifest_list,
                "schema-id": schema_id,
            },
        ],
        "snapshot-log": [
            *(prev.get("snapshot-log", []) if prev else []),
            {"snapshot-id": snapshot_id, "timestamp-ms": now_ms},
        ],
        "metadata-log": [
            *(prev.get("metadata-log", []) if prev else []),
            *([{"metadata-file": prev_path,
                "timestamp-ms": int(prev.get("last-updated-ms", 0))}]
              if prev else []),
        ],
    }
    meta_path = fs_join(meta_dir, f"v{out_version}.metadata.json")
    if not _cas_metadata(fs, None, root, meta_path,
                         json.dumps(metadata, indent=2).encode(), out_version):
        return None, None
    return meta_path, manifest_list


def compact_iceberg(
    spark, root: str, *,
    small_file_mb: int = 32,
    target_file_mb: int = 128,
    min_input_files: int = 4,
    _retry: int = 0, _out: tuple | None = None,
) -> dict:
    """Bin-pack an append-only landing zone's small files into
    target-sized ones, committed as one Iceberg ``replace`` snapshot.

    The 100 TB problem this solves: a replay tailing the landing zone
    per-epoch leaves one small parquet batch per commit — after 10^4
    epochs the table is 10^4 tiny files and every full scan pays 10^4
    file opens. Compaction reads the files smaller than
    ``small_file_mb`` in ONE Spark job, coalesces them to
    ~``target_file_mb`` outputs (coalesce, not repartition: bin-packing
    needs no key placement, and a repartition would shuffle every
    rewritten byte twice — the scan's own split packing already groups
    small files into right-sized read partitions), and commits a
    snapshot that carries the untouched big files as EXISTING and the
    packed files as ADDED. Old
    files stay on disk (older snapshots and snapshot-cursor consumers
    still reference them — Iceberg's retention model) until expiry.

    Logical content is unchanged, so the snapshot's operation is
    ``replace``: `read_iceberg_appends` skips it (a consumer's cursor
    never double-reads), time travel to pre-compaction snapshots still
    works, and the seq-cursor replay tail is oblivious. Rewritten rows
    keep a data sequence number equal to the newest input's, mirroring
    Iceberg's rewrite rule (sequence preserved, never advanced past
    concurrent deletes — moot here, landing zones carry none, but kept
    spec-shaped).

    Concurrency: appenders may race this commit — a lost CAS re-derives
    against the winner's chain, reusing the already-packed output (the
    inputs are immutable; the winner only added files). A racing SECOND
    compactor is refused (its rewrite removed our inputs): maintenance
    owns the table while it runs, same discipline as the lake GC.

    Returns ``{"status": "noop"|"compacted", ...}`` with file/row
    counts; reference analogue: Iceberg's RewriteDataFiles action.
    """
    from arc_spark.lake.iceberg_read import (
        _load_snapshot_files,
        resolve_metadata_file,
    )

    fs = get_fs(root, spark)
    prev_path = resolve_metadata_file(fs, root, prefer_hint=False)
    prev = json.loads(fs.read_bytes(prev_path))
    if prev.get("current-snapshot-id") is None:
        return {"status": "noop", "reason": "no current snapshot"}
    data_files, deletes = _load_snapshot_files(
        fs, prev, with_stats=True, with_bounds=True
    )
    if deletes:
        raise ValueError(
            "compact_iceberg maintains append-only landing zones; this "
            "table carries delete files — it belongs to an upsert writer "
            "(use LakeTable.compact for the lake's own tables)"
        )
    # foreign manifests may omit stats; fill from footers once
    need = [t[0] for t in data_files if t[2] is None or t[3] is None]
    if need:
        fixed = dict(zip(need, _pooled_stats(fs, need)))
        data_files = [
            (p, s, *(fixed[p] if p in fixed else (n, sz)), a, b)
            for p, s, n, sz, a, b in data_files
        ]

    if _out is None:
        small = [t for t in data_files if t[3] < small_file_mb * 1024 * 1024]
        if len(small) < min_input_files:
            return {"status": "noop", "small_files": len(small),
                    "min_input_files": min_input_files}
        small_paths = [t[0] for t in small]
        total_bytes = sum(t[3] for t in small)
        n_out = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
        out_dir = fs_join(root, "data", f"compact-{uuid.uuid4().hex[:12]}")
        (spark.read.option("mergeSchema", "true").parquet(*small_paths)
             .coalesce(int(n_out)).write.mode("overwrite")
             .parquet(out_dir))
    else:
        # CAS-loss retry: the packed output and input set are fixed; only
        # the metadata derivation repeats against the winner's chain
        out_dir, small_paths = _out
        live = {t[0] for t in data_files}
        gone = [p for p in small_paths if p not in live]
        if gone:
            raise RuntimeError(
                "compact_iceberg: a concurrent rewrite removed "
                f"{len(gone)} of this compaction's input files (e.g. "
                f"{gone[0]}) — two compactors are racing; run one"
            )
    small_set = set(small_paths)
    kept = [t for t in data_files if t[0] not in small_set]
    small = [t for t in data_files if t[0] in small_set]
    new_files = sorted(
        fs_join(out_dir, name) for name in fs.listdir(out_dir)
        if name.endswith(".parquet")
    )

    m = re.match(r".*v(\d+)\.metadata\.json$", prev_path)
    out_version = int(m.group(1)) + 1
    seq = int(prev.get("last-sequence-number", 0)) + 1
    snapshot_id = max(s["snapshot-id"] for s in prev["snapshots"]) + 1
    now_ms = max(int(time.time() * 1000),
                 int(prev.get("last-updated-ms", 0)) + 1)
    rewrite_seq = max(t[1] for t in small)  # newest input's data sequence

    entries, kept_rows = [], 0
    # current schema verbatim: a rewrite never evolves the schema
    schema_id = int(prev.get("current-schema-id", 0))
    schemas = list(prev.get("schemas") or [])
    if not schemas and prev.get("schema"):
        # v1-style metadata: single "schema" field instead of history
        schemas = [{**prev["schema"], "schema-id": schema_id}]
    schema_json = next(
        (s for s in schemas if s.get("schema-id") == schema_id), None
    )
    if schema_json is None:
        raise ValueError(
            f"compact_iceberg: current schema id {schema_id} not found in "
            f"{prev_path} — table metadata carries no resolvable schema"
        )

    num_cols = _numeric_bound_cols(schema_json["fields"])
    for path, fseq, n, size, added_by, (lo_b, hi_b) in kept:  # EXISTING
        kept_rows += n
        entries.append({
            "status": 0,
            "snapshot_id": added_by if added_by is not None else snapshot_id,
            "sequence_number": fseq,
            "file_sequence_number": fseq,
            "data_file": {
                "content": 0, "file_path": path, "file_format": "PARQUET",
                "partition": {}, "record_count": n,
                "file_size_in_bytes": size,
                "lower_bounds": lo_b, "upper_bounds": hi_b,
                "equality_ids": None,
            },
        })
    packed_rows = 0
    for path, (n, size, bnds) in zip(
        new_files, _pooled_stats_multi(fs, new_files, num_cols)
    ):
        packed_rows += n
        lo_b, hi_b = _bounds_cells(bnds, num_cols)
        entries.append({
            "status": 1,  # ADDED — but by a replace: appends-consumers skip
            "snapshot_id": snapshot_id,
            "sequence_number": rewrite_seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": 0, "file_path": path, "file_format": "PARQUET",
                "partition": {}, "record_count": n,
                "file_size_in_bytes": size,
                # a bin-pack merges files, so its bounds are the inputs'
                # union — recomputed from the packed footer, never guessed
                "lower_bounds": lo_b, "upper_bounds": hi_b,
                "equality_ids": None,
            },
        })
    in_rows = sum(t[2] for t in small)
    if packed_rows != in_rows:
        raise RuntimeError(
            f"compact_iceberg: packed {packed_rows} rows from {in_rows} "
            "input rows — refusing to commit a lossy rewrite"
        )
    name_mapping = json.loads(
        (prev.get("properties") or {}).get("schema.name-mapping.default", "[]")
    )
    meta_path, manifest_list = _publish_landing_snapshot(
        fs, root,
        prev=prev, prev_path=prev_path,
        uid=f"c{out_version}-{uuid.uuid4().hex[:16]}",
        entries=entries, seq=seq,
        min_seq=min([t[1] for t in kept] + [rewrite_seq]),
        snapshot_id=snapshot_id, out_version=out_version, now_ms=now_ms,
        operation="replace",
        summary={"added-data-files": str(len(new_files)),
                 "deleted-data-files": str(len(small)),
                 "added-records": str(packed_rows),
                 "deleted-records": str(in_rows)},
        schemas=schemas, schema_id=schema_id, schema_json=schema_json,
        name_mapping=name_mapping,
        last_col_id=int(prev.get("last-column-id", 0)),
        counts=(len(new_files), len(kept), len(small),
                packed_rows, kept_rows, in_rows),
    )
    if meta_path is None:
        if _retry >= 3:
            raise RuntimeError(
                f"compact_iceberg: lost the metadata CAS at {root} "
                f"v{out_version} 3 times — writers are racing faster than "
                "the retry budget"
            )
        return compact_iceberg(
            spark, root, small_file_mb=small_file_mb,
            target_file_mb=target_file_mb, min_input_files=min_input_files,
            _retry=_retry + 1, _out=(out_dir, small_paths),
        )
    return {
        "status": "compacted",
        "metadata": meta_path,
        "manifest_list": manifest_list,
        "input_files": len(small),
        "output_files": len(new_files),
        "rows": packed_rows,
        "kept_files": len(kept),
        "snapshot_id": snapshot_id,
    }


def expire_iceberg_landing(spark, root: str, *, keep_last: int = 2,
                           _retry: int = 0) -> dict:
    """Expire old snapshots of an append-only landing zone and reclaim
    the files only they reference — the space-recovery half of
    :func:`compact_iceberg` (the rewrite keeps its small input files on
    disk for older snapshots and snapshot-cursor consumers; this is what
    finally deletes them).

    Keeps the newest ``keep_last`` snapshots (the current one always
    survives), commits a new metadata version listing only the
    survivors, then deletes data files and manifest Avros referenced by
    no survivor. Old ``v*.metadata.json`` files stay on disk, as real
    Iceberg leaves them. A consumer whose ``read_iceberg_appends``
    cursor names an expired snapshot gets that function's explicit
    re-bootstrap error rather than silent row loss. Maintenance owns
    the table while this runs (the lake-GC discipline); a CAS loss to a
    racing appender re-derives once against the winner's chain.

    Mirrors Iceberg's own ``expire_snapshots`` semantics;
    :func:`expire_iceberg_snapshots` is the sibling for lake-mirror
    exports (where file liveness is decided by the lake GC, not age).
    """
    from arc_spark.formats.avro import read_ocf_bytes
    from arc_spark.lake.iceberg_read import resolve_metadata_file

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    fs = get_fs(root, spark)
    meta_dir = fs_join(root, "metadata")
    meta_path = resolve_metadata_file(fs, root, prefer_hint=False)
    meta = json.loads(fs.read_bytes(meta_path))
    snaps = sorted(meta.get("snapshots", []),
                   key=lambda s: int(s.get("sequence-number", 0)))
    if len(snaps) <= keep_last:
        return {"status": "noop", "snapshots": len(snaps),
                "keep_last": keep_last}
    kept, dropped = snaps[-keep_last:], snaps[:-keep_last]

    def _files_and_avros(snapshot):
        """(every data-file path an entry references, manifest avros)."""
        paths, avros = set(), [snapshot["manifest-list"]]
        _, manifests = read_ocf_bytes(fs.read_bytes(snapshot["manifest-list"]))
        for m in manifests:
            avros.append(m["manifest_path"])
            _, entries = read_ocf_bytes(fs.read_bytes(m["manifest_path"]))
            for e in entries:
                paths.add(e["data_file"]["file_path"])
        return paths, avros

    keep_files, keep_avro = set(), set()
    for s in kept:
        p, a = _files_and_avros(s)
        keep_files |= p
        keep_avro |= {x.rsplit("/", 1)[-1] for x in a}
    drop_files, drop_avro = set(), set()
    for s in dropped:
        try:
            p, a = _files_and_avros(s)
        except FileNotFoundError:
            continue  # already half-expired
        drop_files |= p
        drop_avro |= {x.rsplit("/", 1)[-1] for x in a}
    reap = sorted(drop_files - keep_files)

    keep_ids = {s["snapshot-id"] for s in kept}
    m = re.match(r".*v(\d+)\.metadata\.json$", meta_path)
    out_version = int(m.group(1)) + 1
    # Attained-bounds laundering guard: max_seq_bound proves exactness
    # from per-snapshot summary markers, but files a foreign snapshot
    # ADDED can outlive it as EXISTING entries in later engine snapshots.
    # Expiring an UNMARKED snapshot would then leave a chain where every
    # listed snapshot is marked while a foreign (merely conservative)
    # bound is still live — so if any dropped snapshot lacks the marker,
    # strip the table property for good, exactly the "one foreign commit
    # and the claim is gone" semantics the property documents.
    props = dict(meta.get("properties") or {})
    if props.get("arc.bounds.tight") == "true" and any(
        (s.get("summary") or {}).get("arc.bounds.tight") != "true"
        for s in dropped
    ):
        props.pop("arc.bounds.tight", None)
    new_meta = {
        **meta,
        "properties": props,
        "last-updated-ms": max(
            int(time.time() * 1000), int(meta.get("last-updated-ms", 0)) + 1
        ),
        "snapshots": kept,
        "snapshot-log": [
            e for e in meta.get("snapshot-log", [])
            if e["snapshot-id"] in keep_ids
        ],
        "metadata-log": [
            *meta.get("metadata-log", []),
            {"metadata-file": meta_path,
             "timestamp-ms": int(meta.get("last-updated-ms", 0))},
        ],
    }
    if not _cas_metadata(
        fs, None, root, fs_join(meta_dir, f"v{out_version}.metadata.json"),
        json.dumps(new_meta, indent=2).encode(), out_version,
    ):
        if _retry >= 3:
            raise RuntimeError(
                f"expire_iceberg_landing: lost the metadata CAS at {root} "
                f"v{out_version} 3 times"
            )
        return expire_iceberg_landing(spark, root, keep_last=keep_last,
                                      _retry=_retry + 1)
    # the new version is committed: nothing can reach the dropped
    # snapshots through the chain head anymore — reap their exclusives
    for p in reap:
        try:
            fs.delete(p)
        except FileNotFoundError:
            pass
    # avro reap scoped to the DROPPED snapshots' manifests — never a
    # blanket "everything unknown" sweep, which would race a concurrent
    # appender's just-committed manifests (the one race the docstring
    # promises to survive) and leave the table head dangling
    for name in sorted(drop_avro - keep_avro):
        try:
            fs.delete(fs_join(meta_dir, name))
        except FileNotFoundError:
            pass
    return {
        "status": "expired",
        "snapshots_kept": len(kept),
        "snapshots_dropped": len(dropped),
        "data_files_deleted": len(reap),
    }
