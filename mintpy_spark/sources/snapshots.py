"""Snapshot store: manifest-committed table versions with time travel,
copy-on-write MERGE upsert, rollback, and snapshot expiry.

This is the table-level complement to TableStore's partition-level
overwrite (sources/tables.py) and the file-backed analog of the Iceberg
semantics the production deployment uses (SURVEY.md §1.3):

- a snapshot is a JSON **manifest** listing immutable data files; the
  manifest file is written to a temp name and ``os.rename``d into place,
  so a snapshot is visible iff its rename completed — data files without
  a committed manifest are invisible garbage, never partial reads
  (the same crash-safety contract as the reference's partial-write
  detection, ifgram_inversion.py:48-55);
- **time travel**: ``read(spark, table, as_of=v)`` pins any committed
  version; default is the latest;
- **upsert** is copy-on-write MERGE: new rows replace old rows with the
  same key, untouched rows are carried into the new snapshot by
  REFERENCE (the manifest lists the old files) when no file contains a
  matching key, else rewritten — here the sandbox rewrites the whole
  non-matching remainder for simplicity, but the manifest layer is what
  production file-level pruning plugs into;
- **expire** deletes data files referenced only by dropped manifests —
  the GC that bounds storage under continuous upserts.

Concurrency: single-writer per table (the engine's jobs are driver
-scheduled); the atomic-rename commit still protects readers from
partial snapshots under writer crashes.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _data(self, table: str) -> str:
        return os.path.join(self._tdir(table), "data")

    def _mdir(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_manifests")

    # -- snapshot metadata -------------------------------------------------
    def versions(self, table: str) -> list[int]:
        md = self._mdir(table)
        if not os.path.isdir(md):
            return []
        out = []
        for f in os.listdir(md):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    def manifest(self, table: str, version: int) -> dict:
        with open(os.path.join(self._mdir(table), f"v{version}.json")) as fh:
            return json.load(fh)

    def latest(self, table: str) -> int | None:
        vs = self.versions(table)
        return vs[-1] if vs else None

    # -- write path ---------------------------------------------------------
    def _stage_files(self, df: DataFrame, table: str) -> list[str]:
        """Write df as immutable data files under data/ with unique names;
        returns their table-relative paths. Files are INVISIBLE until a
        manifest referencing them commits."""
        tmp = os.path.join(self._tdir(table), f"_tmp_{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(tmp)
        os.makedirs(self._data(table), exist_ok=True)
        out = []
        prefix = uuid.uuid4().hex[:8]
        i = 0
        for f in sorted(os.listdir(tmp)):
            if not f.endswith(".parquet"):
                continue
            rel = os.path.join("data", f"{prefix}-{i:05d}.parquet")
            os.rename(os.path.join(tmp, f), os.path.join(self._tdir(table), rel))
            out.append(rel)
            i += 1
        shutil.rmtree(tmp, ignore_errors=True)
        return out

    def _commit(self, table: str, files: list[str], op: str) -> int:
        md = self._mdir(table)
        os.makedirs(md, exist_ok=True)
        parent = self.latest(table)
        v = 1 if parent is None else parent + 1
        body = {"version": v, "parent": parent, "op": op, "files": files}
        tmp = os.path.join(md, f"_tmp_{uuid.uuid4().hex[:8]}.json")
        with open(tmp, "w") as fh:
            json.dump(body, fh)
        os.rename(tmp, os.path.join(md, f"v{v}.json"))  # the commit point
        return v

    def write(self, df: DataFrame, table: str) -> int:
        """Full overwrite: new snapshot referencing only the new files."""
        return self._commit(table, self._stage_files(df, table), "overwrite")

    def append(self, df: DataFrame, table: str) -> int:
        """Append: new snapshot = parent's files + the new files."""
        old = []
        v = self.latest(table)
        if v is not None:
            old = self.manifest(table, v)["files"]
        return self._commit(table, old + self._stage_files(df, table), "append")

    def upsert(
        self, spark: SparkSession, df: DataFrame, table: str, key: str
    ) -> int:
        """Copy-on-write MERGE by key: rows of the current snapshot whose
        key appears in df are replaced; all others carried over. The
        remainder is rewritten (sandbox simplification — production
        prunes untouched FILES via manifest min/max and carries them by
        reference)."""
        v = self.latest(table)
        if v is None:
            return self.write(df, table)
        cur = self.read(spark, table)
        keep = cur.join(df.select(key).distinct(), key, "left_anti")
        merged_files = self._stage_files(keep.unionByName(df), table)
        return self._commit(table, merged_files, "upsert")

    def rollback(self, table: str, version: int) -> int:
        """New snapshot re-referencing an old version's files (Iceberg
        rollback is a new metadata entry, never a data rewrite)."""
        files = self.manifest(table, version)["files"]
        return self._commit(table, files, f"rollback->{version}")

    # -- read path -----------------------------------------------------------
    def read(
        self, spark: SparkSession, table: str, as_of: int | None = None
    ) -> DataFrame:
        v = self.latest(table) if as_of is None else as_of
        if v is None:
            raise ValueError(f"snapshot table {table!r} has no committed version")
        files = self.manifest(table, v)["files"]
        if not files:
            raise ValueError(f"{table!r} v{v} references no files")
        paths = [os.path.join(self._tdir(table), f) for f in files]
        # mergeSchema: snapshots written before a column was added coexist
        # with newer files in one manifest (append-time schema evolution);
        # readers see the union schema with NULLs for pre-evolution files
        return spark.read.option("mergeSchema", "true").parquet(*paths)

    def compact(self, spark: SparkSession, table: str, target_files: int = 1) -> int:
        """Small-file compaction: rewrite the CURRENT snapshot's rows into
        ``target_files`` files and commit as a new version (old versions
        keep referencing the old files until expire()). The maintenance
        companion to continuous upserts, which otherwise accrete one
        file-set per merge."""
        cur = self.read(spark, table).coalesce(max(1, int(target_files)))
        return self._commit(table, self._stage_files(cur, table), "compact")

    # -- maintenance -----------------------------------------------------------
    def expire(self, table: str, keep_last: int = 2) -> list[str]:
        """Drop all but the newest ``keep_last`` manifests, then delete
        data files no surviving manifest references. Returns the deleted
        file paths (table-relative)."""
        assert keep_last >= 1
        vs = self.versions(table)
        dead_vs, live_vs = vs[:-keep_last], vs[-keep_last:]
        live_files = set()
        for v in live_vs:
            live_files.update(self.manifest(table, v)["files"])
        for v in dead_vs:
            os.remove(os.path.join(self._mdir(table), f"v{v}.json"))
        deleted = []
        data = self._data(table)
        if os.path.isdir(data):
            for f in sorted(os.listdir(data)):
                rel = os.path.join("data", f)
                if rel not in live_files:
                    os.remove(os.path.join(data, f))
                    deleted.append(rel)
        return deleted
