"""Snapshot-versioned table catalog — checkpoint/resume for the crawl.

The production design is an Iceberg catalog: one snapshot per crawl round,
``MERGE INTO`` upserts (reference upsert-by-URL semantics:
search/storage/bleve/storage.go:65-91), resume = read any snapshot. The
sandbox image has no Iceberg runtime jar, so this module implements the same
contract over plain parquet + a JSON manifest:

* every :meth:`SnapshotCatalog.commit` writes the changed tables under a new
  ``snapshots/<sid>/`` directory, re-points unchanged tables at their prior
  files (cheap snapshots, like Iceberg manifest reuse), and atomically
  replaces ``manifest.json`` (os.replace) — a crash mid-commit leaves the
  previous snapshot intact;
* :meth:`load` reads any table at any snapshot → the crawl resumes exactly
  from a checkpoint (north_rule requirement).

Swapping in Iceberg on a real cluster replaces this class with
``spark.table`` / ``MERGE INTO`` calls; all callers go through this
interface. Writing state to storage each round also truncates DataFrame
lineage — mandatory for an iterative algorithm at 10^10 scale.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class SnapshotCatalog:
    def __init__(
        self, spark: SparkSession, root: str, emit_iceberg_sql: bool = False
    ):
        self.spark = spark
        self.root = root
        # behind this flag every commit also records the Iceberg SQL the
        # production catalog swap would run (see the generators at the
        # bottom of this module); golden-pinned in tests/test_tables.py
        self.emit_iceberg_sql = emit_iceberg_sql
        self.emitted_sql: list[str] = []
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)

    # ------------------------------------------------------------ manifest

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def _read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"current": None, "snapshots": {}}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path)  # atomic pointer swap

    # ------------------------------------------------------------ snapshots

    def latest(self) -> int | None:
        cur = self._read_manifest()["current"]
        return None if cur is None else int(cur)

    def snapshot_ids(self) -> list[int]:
        return sorted(int(s) for s in self._read_manifest()["snapshots"])

    def commit(
        self,
        tables: dict[str, DataFrame] | None = None,
        properties: dict | None = None,
        appends: dict[str, DataFrame] | None = None,
    ) -> int:
        """Write a new snapshot: ``tables`` are fully (re)written,
        ``appends`` add a delta file-set to an existing table (Iceberg
        fast-append analog — the grown table is never rewritten, which is
        what keeps per-round commit cost O(delta) instead of O(total) for
        monotone tables like `seen`), everything else carries over from the
        current snapshot by reference."""
        manifest = self._read_manifest()
        sid = 0 if manifest["current"] is None else int(manifest["current"]) + 1
        prev = (
            manifest["snapshots"].get(str(manifest["current"]), {"tables": {}})
            if manifest["current"] is not None
            else {"tables": {}}
        )
        entry = {"tables": dict(prev["tables"]), "properties": properties or {}}

        # Sequential writes by default: measured at local[16], concurrent
        # write jobs contend on cache/disk and run slower than back-to-back
        # (opt back in with GOPROWL_THREADED_COMMIT=1 for multi-executor
        # clusters where the jobs land on disjoint machines).
        def write(item: tuple[str, DataFrame]) -> tuple[str, str]:
            name, df = item
            path = os.path.join(self.root, "snapshots", str(sid), name)
            df.write.mode("overwrite").parquet(path)
            return name, path

        work = list((tables or {}).items()) + list((appends or {}).items())
        if len(work) > 1 and os.environ.get("GOPROWL_THREADED_COMMIT") == "1":
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(work)) as pool:
                written = dict(pool.map(write, work))
        else:
            written = dict(map(write, work))

        for name in tables or {}:
            entry["tables"][name] = written[name]
        for name in appends or {}:
            existing = entry["tables"].get(name)
            paths = self._entry_paths(existing) if existing is not None else []
            cols = self._entry_columns(existing) if existing is not None else None
            new_paths = paths + [written[name]]
            entry["tables"][name] = (
                {"paths": new_paths, "columns": cols} if cols else new_paths
            )
        manifest["snapshots"][str(sid)] = entry
        manifest["current"] = sid
        self._write_manifest(manifest)
        return sid

    # -------------------------------------------------------- staged commit

    def next_sid(self) -> int:
        cur = self._read_manifest()["current"]
        return 0 if cur is None else int(cur) + 1

    def stage_path(self, sid: int, name: str) -> str:
        """Where a caller should write table ``name`` for snapshot ``sid``
        (lets the caller interleave its own actions between table writes —
        e.g. collecting Observation metrics after one write feeds the next)."""
        return os.path.join(self.root, "snapshots", str(sid), name)

    @staticmethod
    def _entry_paths(entry) -> list[str]:
        if isinstance(entry, dict):
            return list(entry["paths"])
        return entry if isinstance(entry, list) else [entry]

    @staticmethod
    def _entry_columns(entry) -> list[str] | None:
        return entry.get("columns") if isinstance(entry, dict) else None

    def commit_staged(
        self,
        sid: int,
        tables: dict[str, str] | None = None,
        appends: dict[str, str] | None = None,
        properties: dict | None = None,
        projections: dict[str, list[str]] | None = None,
    ) -> int:
        """Finish a staged snapshot: paths were already written by the
        caller (via stage_path); this just swings the manifest pointer —
        the atomic step. tables: name→path full replace; appends:
        name→path delta. ``projections``: per-table column list applied on
        load — lets TWO logical tables share ONE physical delta file (the
        crawl's seen/frontier delta is written once per round), the
        manifest-level equivalent of an Iceberg metadata-only view."""
        manifest = self._read_manifest()
        expect = 0 if manifest["current"] is None else int(manifest["current"]) + 1
        if sid != expect:
            raise ValueError(f"staged sid {sid} != expected {expect}")
        prev = (
            manifest["snapshots"].get(str(manifest["current"]), {"tables": {}})
            if manifest["current"] is not None
            else {"tables": {}}
        )
        entry = {"tables": dict(prev["tables"]), "properties": properties or {}}
        projections = projections or {}
        for name, path in (tables or {}).items():
            cols = projections.get(name)
            entry["tables"][name] = (
                {"paths": [path], "columns": cols} if cols else path
            )
        for name, path in (appends or {}).items():
            old = entry["tables"].get(name)
            paths = (self._entry_paths(old) if old is not None else []) + [path]
            cols = projections.get(name) or (
                self._entry_columns(old) if old is not None else None
            )
            entry["tables"][name] = (
                {"paths": paths, "columns": cols} if cols else paths
            )
        manifest["snapshots"][str(sid)] = entry
        manifest["current"] = sid
        if self.emit_iceberg_sql:
            for name in sorted(tables or {}):
                cols = projections.get(name)
                if cols:
                    self.emitted_sql.append(
                        iceberg_overwrite_sql(f"{name}_base")
                    )
                    self.emitted_sql.append(
                        iceberg_projection_view_sql(name, f"{name}_base", cols)
                    )
                else:
                    self.emitted_sql.append(iceberg_overwrite_sql(name))
            for name in sorted(appends or {}):
                cols = projections.get(name)
                if cols:
                    self.emitted_sql.append(iceberg_append_sql(f"{name}_base"))
                    self.emitted_sql.append(
                        iceberg_projection_view_sql(name, f"{name}_base", cols)
                    )
                else:
                    self.emitted_sql.append(iceberg_append_sql(name))
        self._write_manifest(manifest)
        return sid

    def load(
        self,
        table: str,
        snapshot_id: int | None = None,
        schema: T.StructType | None = None,
    ) -> DataFrame:
        """Read ``table`` at ``snapshot_id`` (default: current). A table
        absent from the snapshot returns an empty DataFrame when ``schema``
        is given (first crawl round bootstraps from empty state). Entries
        carrying a column projection are selected down on read (column
        pruning reaches the parquet scan)."""
        manifest = self._read_manifest()
        sid = manifest["current"] if snapshot_id is None else snapshot_id
        entry = manifest["snapshots"].get(str(sid), {"tables": {}}) if sid is not None else {"tables": {}}
        e = entry["tables"].get(table)
        if e is None:
            if schema is None:
                raise KeyError(f"table {table!r} not in snapshot {sid!r}")
            return self.spark.createDataFrame([], schema)
        df = self.spark.read.parquet(*self._entry_paths(e))
        cols = self._entry_columns(e)
        return df.select(*cols) if cols else df

    def properties(self, snapshot_id: int | None = None) -> dict:
        manifest = self._read_manifest()
        sid = manifest["current"] if snapshot_id is None else snapshot_id
        if sid is None:
            return {}
        return manifest["snapshots"].get(str(sid), {}).get("properties", {})


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    table_name: str | None = None,
    emitted_sql: list[str] | None = None,
) -> DataFrame:
    """MERGE-INTO stand-in: rows in ``updates`` replace same-key rows in
    ``target`` (reference upsert-by-URL: bleve/storage.go:65-91). On Iceberg
    this is a real ``MERGE INTO ... ON t.key = u.key`` — pass ``table_name``
    and an ``emitted_sql`` list to record the exact statement the production
    swap would run (golden-pinned in tests/test_tables.py)."""
    if emitted_sql is not None and table_name is not None:
        emitted_sql.append(iceberg_merge_upsert_sql(table_name, key))
    return target.join(updates.select(key), on=key, how="left_anti").unionByName(
        updates
    )


# ------------------------------------------------------- Iceberg SQL emission
#
# The sandbox has no Iceberg runtime jar, so SnapshotCatalog implements the
# snapshot contract over parquet+manifest. These generators produce the SQL
# a real Iceberg deployment runs for each catalog operation, so the swap is
# mechanical: same call sites, `spark.sql(stmt)` instead of manifest edits.
# The statements are golden-pinned in tests/test_tables.py.

ICEBERG_NAMESPACE = "goprowl"


def _qualified(name: str, catalog: str) -> str:
    return f"{catalog}.{ICEBERG_NAMESPACE}.{name}"


def iceberg_create_table_sql(
    name: str,
    schema: T.StructType,
    partition_by: tuple[str, ...] = (),
    catalog: str = "spark_catalog",
) -> str:
    cols = ",\n  ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
    )
    part = (
        f"\nPARTITIONED BY ({', '.join(partition_by)})" if partition_by else ""
    )
    return (
        f"CREATE TABLE IF NOT EXISTS {_qualified(name, catalog)} (\n  {cols}\n)"
        f"\nUSING iceberg{part}"
        "\nTBLPROPERTIES ('format-version' = '2', "
        "'write.distribution-mode' = 'hash')"
    )


def iceberg_merge_upsert_sql(
    name: str, key: str, source: str = "updates", catalog: str = "spark_catalog"
) -> str:
    t = _qualified(name, catalog)
    return (
        f"MERGE INTO {t} t\nUSING {source} u\nON t.{key} = u.{key}\n"
        "WHEN MATCHED THEN UPDATE SET *\n"
        "WHEN NOT MATCHED THEN INSERT *"
    )


def iceberg_append_sql(
    name: str, source: str = "staged", catalog: str = "spark_catalog"
) -> str:
    return f"INSERT INTO {_qualified(name, catalog)}\nSELECT * FROM {source}"


def iceberg_overwrite_sql(
    name: str, source: str = "staged", catalog: str = "spark_catalog"
) -> str:
    return (
        f"INSERT OVERWRITE {_qualified(name, catalog)}\nSELECT * FROM {source}"
    )


def iceberg_projection_view_sql(
    view: str, source: str, columns: list[str], catalog: str = "spark_catalog"
) -> str:
    """The manifest's projection entry (two logical tables over one physical
    delta) is a metadata-only view on Iceberg."""
    return (
        f"CREATE OR REPLACE VIEW {_qualified(view, catalog)} AS\n"
        f"SELECT {', '.join(columns)} FROM {_qualified(source, catalog)}"
    )


def iceberg_rollback_sql(
    name: str, snapshot_id: int, catalog: str = "spark_catalog"
) -> str:
    """Resume-from-checkpoint = snapshot rollback on Iceberg."""
    return (
        f"CALL {catalog}.system.rollback_to_snapshot"
        f"('{ICEBERG_NAMESPACE}.{name}', {snapshot_id})"
    )


# ---------------------------------------------------------------- local write

_PA_TYPES = None


def write_local_parquet(rows: list[tuple], schema: T.StructType, path: str) -> None:
    """Write a METADATA-SIZED table (metrics row, lineage counters) as one
    parquet file directly from the driver — no Spark job.

    A 1-row metrics frame or a 50-row lineage frame costs more in job
    scheduling than in IO; at 16 cores the tail of tiny writes was the
    round's largest non-scaling term. The pyarrow schema maps Spark types
    EXACTLY (int32/int64/float64/string) so later `spark.read.parquet`
    over mixed Spark-written + driver-written files of the same table
    never sees a physical-type conflict."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    global _PA_TYPES
    if _PA_TYPES is None:
        _PA_TYPES = {
            T.IntegerType(): pa.int32(),
            T.LongType(): pa.int64(),
            T.DoubleType(): pa.float64(),
            T.FloatType(): pa.float32(),
            T.StringType(): pa.string(),
            T.BooleanType(): pa.bool_(),
        }
    pa_schema = pa.schema(
        [(f.name, _PA_TYPES[f.dataType]) for f in schema.fields]
    )
    os.makedirs(path, exist_ok=True)
    cols = list(zip(*rows)) if rows else [[] for _ in schema.fields]
    table = pa.Table.from_arrays(
        [pa.array(c, type=t) for c, t in zip(cols, pa_schema.types)],
        schema=pa_schema,
    )
    pq.write_table(table, os.path.join(path, "part-00000.parquet"))


def parquet_file_rows(path: str) -> list[tuple[int, int]]:
    """(file_index, num_rows) per data file of a parquet directory, read
    from footers driver-side (no Spark job) — the per-partition lineage of
    a just-written table (one file per write task)."""
    import pyarrow.parquet as pq

    out = []
    files = sorted(
        f for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    for i, fname in enumerate(files):
        out.append((i, pq.ParquetFile(os.path.join(path, fname)).metadata.num_rows))
    return out
