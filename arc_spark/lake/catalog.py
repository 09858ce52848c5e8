"""A versioned multi-table catalog with atomic cross-table commits.

One binlog/WAL stream almost never feeds one table: a Debezium connector
tails a whole database, and each change event carries ``source.table``.
Applying such a stream per-table with independent commits loses the one
property the upstream database gave for free — cross-table consistency:
a reader joining ``orders`` to ``order_lines`` mid-epoch would see a
state no upstream transaction ever produced.

``LakeCatalog`` restores that property the way Iceberg REST catalogs /
Nessie do — multi-table commits through a single versioned pointer:

- The catalog is a chain of immutable JSON manifests
  ``_catalog/v{n}.json`` committed with the same create-exclusive CAS
  (optionally locker-guarded) as :class:`arc_spark.lake.table.LakeTable`
  manifests.
- Each catalog version pins a **version-set**: ``{table_name: table
  manifest version}``. ``read(spark, name)`` resolves THROUGH the pin, so
  a catalog version is a consistent cross-table snapshot.
- A replicated epoch commits in two phases: (1) every touched table's
  merge commits normally (data + per-table manifest — invisible to
  catalog readers, exactly like an uncommitted Iceberg snapshot), then
  (2) ONE catalog CAS publishes the new version-set with the epoch's seq
  window fenced in ``committed_epochs``. A crash between the phases
  leaves catalog readers on the old consistent set; the rerun's table
  merges are fenced no-ops (``status: skipped``) and the catalog commit
  completes the epoch idempotently.
- Epoch fencing lives at the CATALOG level: offsets for the shared
  stream advance only when every table's change is visible, so
  exactly-once holds for the set, not just each member.

Scale: the catalog manifest is O(#tables) — metadata only. Everything
row-shaped stays in the per-table bucketed data layout.

Reference parity: the reference executes one config-driven job per
pipeline with stage-level lineage (``ARC.scala:491-502``); the catalog
extends the same exactly-once bookkeeping across tables the way its
``PipelineExecute`` composes stages.
"""

from __future__ import annotations

import json
import logging
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from arc_spark.fs import get_fs, join as fs_join
from arc_spark.lake.table import CommitConflict, LakeTable

_log = logging.getLogger("arc_spark.lake.catalog")

CATALOG_DIR = "_catalog"
TABLES_DIR = "tables"


@dataclass
class CatalogSnapshot:
    version: int
    epoch: int
    # table name -> {"root": str, "version": int}
    tables: dict[str, dict]
    # epoch -> {"start_seq", "end_seq", "tables": {name: version}}
    committed_epochs: dict[str, dict]
    counters: dict = field(default_factory=dict)
    parent_version: int = -1

    @property
    def end_seq(self) -> int:
        if not self.committed_epochs:
            return -1
        return max(int(v["end_seq"]) for v in self.committed_epochs.values())

    def table_version(self, name: str) -> int:
        return int(self.tables[name]["version"])


class LakeCatalog:
    """Versioned pointer over a set of :class:`LakeTable` roots.

    ``locker``: optional :class:`arc_spark.fs.CommitLocker`, forwarded to
    member tables created through the catalog and used for the catalog's
    own manifest CAS (same object-store caveats as LakeTable).

    Write discipline: tables registered here must be written THROUGH the
    catalog replay (or: writers must commit a catalog version after any
    direct table write) — a direct table commit is invisible to catalog
    readers until the next catalog version pins it, by design.
    """

    def __init__(self, root: str, *, locker=None):
        self.root = root
        self.locker = locker
        self._fs = None

    @property
    def fs(self):
        if self._fs is None:
            self._fs = get_fs(self.root)
        return self._fs

    # -- metadata ----------------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return fs_join(self.root, CATALOG_DIR, f"v{version:012d}.json")

    def exists(self) -> bool:
        d = fs_join(self.root, CATALOG_DIR)
        return any(n.endswith(".json") for n in self.fs.listdir(d))

    def current_version(self) -> int:
        d = fs_join(self.root, CATALOG_DIR)
        versions = [
            int(n[1:-5]) for n in self.fs.listdir(d)
            if n.startswith("v") and n.endswith(".json")
        ]
        return max(versions, default=-1)

    def snapshot(self, version: int | None = None) -> CatalogSnapshot:
        v = self.current_version() if version is None else version
        if v < 0:
            raise FileNotFoundError(f"lake catalog {self.root} does not exist")
        m = json.loads(self.fs.read_bytes(self._manifest_path(v)))
        return CatalogSnapshot(
            version=m["version"],
            epoch=m["epoch"],
            tables=m["tables"],
            committed_epochs=m["committed_epochs"],
            counters=m.get("counters", {}),
            parent_version=m.get("parent_version", -1),
        )

    def _commit(self, manifest: dict) -> int:
        """Same CAS discipline as LakeTable._commit (create-exclusive,
        locker-guarded check-then-put when a locker is set)."""
        version = manifest["version"]
        path = self._manifest_path(version)
        if self.locker is not None:
            token = self.locker.acquire(fs_join(self.root, "_catalog_commit"))
            try:
                if self.fs.exists(path):
                    raise CommitConflict(f"catalog version {version} already committed")
                self.fs.write_bytes(path, json.dumps(manifest).encode())
                return version
            finally:
                self.locker.release(fs_join(self.root, "_catalog_commit"), token)
        try:
            self.fs.create_exclusive(path, json.dumps(manifest).encode())
        except FileExistsError:
            raise CommitConflict(
                f"catalog version {version} already committed"
            ) from None
        return version

    # -- lifecycle ---------------------------------------------------------

    def create(self, *, overwrite: bool = False) -> CatalogSnapshot:
        if self.exists():
            if not overwrite:
                raise FileExistsError(f"catalog exists: {self.root}")
            self.fs.rmtree(self.root)
        self.fs.mkdirs(fs_join(self.root, CATALOG_DIR))
        self._commit(
            {
                "version": 0,
                "epoch": -1,
                "tables": {},
                "committed_epochs": {},
                "counters": {},
                "parent_version": -1,
                "created_at": time.time(),
            }
        )
        return self.snapshot()

    def default_table_root(self, name: str) -> str:
        return fs_join(self.root, TABLES_DIR, name)

    def table(self, name: str, *, version: int | None = None) -> LakeTable:
        """Live handle to a member table (its CURRENT manifest, which may
        be ahead of the catalog pin mid-epoch — use :meth:`read` for
        catalog-consistent data access)."""
        snap = self.snapshot(version)
        if name not in snap.tables:
            raise KeyError(f"table {name!r} not in catalog {self.root}")
        return LakeTable(snap.tables[name]["root"], locker=self.locker)

    def register(
        self,
        name: str,
        *,
        table_root: str | None = None,
        schema: StructType | None = None,
        key_cols: list[str] | None = None,
        seq_col: str = "seq",
        num_buckets: int = 32,
        max_retries: int = 3,
    ) -> LakeTable:
        """Add a table to the catalog. With ``schema`` the table is
        CREATED at ``table_root`` (default ``{root}/tables/{name}``);
        without, an existing LakeTable at ``table_root`` is adopted at
        its current version. Idempotent for an identical registration."""
        root = table_root or self.default_table_root(name)
        table = LakeTable(root, locker=self.locker)
        prior = self.snapshot().tables.get(name)
        if prior is not None and prior["root"] != root:
            raise ValueError(
                f"table {name!r} already registered at {prior['root']}, "
                f"not {root}"
            )
        if schema is not None:
            if not table.exists():
                table.create(
                    schema, list(key_cols or []), seq_col=seq_col,
                    num_buckets=num_buckets,
                )
        elif not table.exists():
            raise FileNotFoundError(
                f"register({name!r}) without schema requires an existing "
                f"table at {root}"
            )
        for attempt in range(max_retries):
            snap = self.snapshot()
            if name in snap.tables:
                if snap.tables[name]["root"] != root:
                    raise ValueError(
                        f"table {name!r} already registered at "
                        f"{snap.tables[name]['root']}, not {root}"
                    )
                return table
            manifest = self._next_manifest(snap)
            manifest["tables"][name] = {
                "root": root,
                "version": table.current_version(),
            }
            try:
                self._commit(manifest)
                return table
            except CommitConflict:
                if attempt == max_retries - 1:
                    raise
        raise RuntimeError("unreachable")

    def _next_manifest(self, snap: CatalogSnapshot) -> dict:
        return {
            "version": snap.version + 1,
            "epoch": snap.epoch,
            "tables": {k: dict(v) for k, v in snap.tables.items()},
            "committed_epochs": dict(snap.committed_epochs),
            "counters": dict(snap.counters),
            "parent_version": snap.version,
        }

    # -- read --------------------------------------------------------------

    def read(
        self, spark: SparkSession, name: str, *, version: int | None = None
    ) -> DataFrame:
        """Catalog-consistent read: resolve ``name`` through the pinned
        version-set of catalog ``version`` (default: current). Two reads
        at the same catalog version always observe the same cross-table
        epoch boundary."""
        snap = self.snapshot(version)
        if name not in snap.tables:
            raise KeyError(f"table {name!r} not in catalog {self.root}")
        entry = snap.tables[name]
        t = LakeTable(entry["root"], locker=self.locker)
        return t.read(spark, version=int(entry["version"]))

    # -- the multi-table commit ---------------------------------------------

    def commit_epoch(
        self,
        epoch: int,
        *,
        start_seq: int,
        end_seq: int,
        table_versions: dict[str, int],
        counters: dict | None = None,
        max_retries: int = 3,
    ) -> dict:
        """Atomically publish one epoch's version-set. Fenced: a retried
        epoch already in ``committed_epochs`` is a no-op. Tables absent
        from ``table_versions`` keep their previous pin (no events for
        them this epoch)."""
        for attempt in range(max_retries):
            snap = self.snapshot()
            if str(epoch) in snap.committed_epochs:
                return {
                    "status": "skipped",
                    "reason": "epoch already committed",
                    "epoch": epoch,
                }
            unknown = set(table_versions) - set(snap.tables)
            if unknown:
                raise KeyError(f"unregistered tables in commit: {sorted(unknown)}")
            manifest = self._next_manifest(snap)
            manifest["epoch"] = epoch
            for name, v in table_versions.items():
                manifest["tables"][name]["version"] = int(v)
            manifest["committed_epochs"][str(epoch)] = {
                "start_seq": start_seq,
                "end_seq": end_seq,
                "tables": {n: int(v) for n, v in table_versions.items()},
            }
            if counters:
                c = manifest["counters"]
                for k, v in counters.items():
                    c[k] = c.get(k, 0) + v
            try:
                version = self._commit(manifest)
                return {"status": "committed", "version": version, "epoch": epoch}
            except CommitConflict:
                if attempt == max_retries - 1:
                    raise
        raise RuntimeError("unreachable")
