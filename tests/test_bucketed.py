"""Bucketed-table co-location: joins and aggregations on the bucket key
must plan with ZERO Exchange (the storage-time one-shuffle design)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from mintpy_spark.sources.bucketed import read_table, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path, obs):
    names = []
    for side in ("a", "b"):
        t = f"t_{side}_{uuid.uuid4().hex[:8]}"
        write_bucketed(
            obs.select("url", "warc_ts", "text_length"),
            t,
            key="url",
            buckets=8,
            path=str(tmp_path / t),
        )
        names.append(t)
    yield names
    for t in names:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    a, b = read_table(spark, ta), read_table(spark, tb)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg_a = a.groupBy("url").agg(F.count("*").alias("na"))
        agg_b = b.groupBy("url").agg(F.sum("text_length").alias("sb"))
        j = agg_a.join(agg_b, "url")
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    ta, _ = bucketed_pair
    a = read_table(spark, ta)
    g = a.groupBy("url").agg(F.count("*").alias("n"), F.max("text_length").alias("m"))
    plan = _plan(g)
    assert "Exchange" not in plan, plan
    assert g.count() > 0


def test_unbucketed_baseline_does_shuffle(spark, tmp_path, obs):
    """Control: the same join over plain parquet NEEDS exchanges — proving
    the bucketed zero-Exchange plans come from the layout, not the data."""
    p = str(tmp_path / "plain")
    obs.select("url", "warc_ts", "text_length").write.mode("overwrite").parquet(p)
    a = spark.read.parquet(p)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            a.groupBy("url").agg(F.count("*").alias("na"))
            .join(spark.read.parquet(p).groupBy("url").agg(F.sum("text_length").alias("s")), "url")
        )
        assert "Exchange" in _plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
