"""SnapshotStore (sources/snapshots.py): commit atomicity, time travel,
MERGE upsert, rollback, and expiry GC."""

from __future__ import annotations

import glob
import os

import pytest

from mintpy_spark.sources.snapshots import SnapshotStore


@pytest.fixture()
def store(tmp_path):
    return SnapshotStore(str(tmp_path / "snap"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_write_read_and_time_travel(spark, store):
    v1 = store.write(_df(spark, [(1, "a"), (2, "b")]), "t")
    v2 = store.append(_df(spark, [(3, "c")]), "t")
    assert (v1, v2) == (1, 2)
    assert store.read(spark, "t").count() == 3
    assert store.read(spark, "t", as_of=1).count() == 2
    # append carries parent files by reference, not by copy
    m1, m2 = store.manifest("t", 1), store.manifest("t", 2)
    assert set(m1["files"]) <= set(m2["files"])


def test_upsert_replaces_by_key(spark, store):
    store.write(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), "t")
    store.upsert(spark, _df(spark, [(2, "B"), (4, "d")]), "t", key="k")
    got = {(r.k, r.v) for r in store.read(spark, "t").collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}
    # old version still readable (time travel across a merge)
    old = {(r.k, r.v) for r in store.read(spark, "t", as_of=1).collect()}
    assert old == {(1, "a"), (2, "b"), (3, "c")}


def test_uncommitted_files_are_invisible(spark, store):
    store.write(_df(spark, [(1, "a")]), "t")
    # simulate a writer crash AFTER staging data but BEFORE the manifest
    # rename: stage files directly, never commit
    store._stage_files(_df(spark, [(9, "ghost")]), "t")
    assert store.read(spark, "t").count() == 1
    assert store.latest("t") == 1


def test_rollback_is_metadata_only(spark, store):
    store.write(_df(spark, [(1, "a")]), "t")
    store.write(_df(spark, [(2, "b")]), "t")
    n_files = len(glob.glob(os.path.join(store.root, "t", "data", "*")))
    v3 = store.rollback("t", 1)
    assert v3 == 3
    assert {r.k for r in store.read(spark, "t").collect()} == {1}
    # no data files were written by the rollback
    assert len(glob.glob(os.path.join(store.root, "t", "data", "*"))) == n_files


def test_expire_gc_keeps_referenced_files(spark, store):
    store.write(_df(spark, [(1, "a")]), "t")
    store.upsert(spark, _df(spark, [(1, "A")]), "t", key="k")
    store.upsert(spark, _df(spark, [(1, "AA")]), "t", key="k")
    deleted = store.expire("t", keep_last=2)
    assert deleted, "v1's files must be GC'd"
    assert store.versions("t") == [2, 3]
    # surviving versions stay readable after GC
    assert store.read(spark, "t", as_of=2).count() == 1
    assert [r.v for r in store.read(spark, "t").collect()] == ["AA"]


def test_schema_evolution_on_append(spark, store):
    store.write(_df(spark, [(1, "a")]), "t")
    evolved = spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double")
    store.append(evolved, "t")
    got = store.read(spark, "t")
    assert set(got.columns) == {"k", "v", "score"}
    rows = {r.k: r.score for r in got.collect()}
    assert rows[1] is None and rows[2] == 9.5
    # pre-evolution snapshot still reads with its own schema
    assert set(store.read(spark, "t", as_of=1).columns) == {"k", "v"}


def test_compact_preserves_rows_and_shrinks_files(spark, store):
    df = spark.range(100).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    store.write(df.repartition(8), "t")
    assert len(store.manifest("t", 1)["files"]) == 8
    v2 = store.compact(spark, "t", target_files=1)
    assert len(store.manifest("t", v2)["files"]) == 1
    assert store.read(spark, "t").count() == 100
    # compaction is a new version; the uncompacted snapshot is intact
    assert len(store.manifest("t", 1)["files"]) == 8
