"""Bucketed (co-located) table layout for exchange-free joins and
aggregations.

At 10^12 rows the dominant cost of any per-url join or aggregation is the
shuffle. Spark's bucketing (``bucketBy(N, key)`` on a saved table) stores
each table pre-hash-partitioned AND records that layout in the catalog,
so a join or groupBy on the bucket key reads co-located buckets and plans
with ZERO Exchange — the storage-time twin of the engine's runtime
``repartition(hash(url))`` one-shuffle design (SCALE.md). On the target
deployment this is the Iceberg table's bucket partition transform
(``bucket(N, url)``); this module provides the same contract through the
Spark catalog available in the sandbox.

Verified by tests/test_bucketed.py: a self-join and a two-table join on
the bucket key plan with 0 Exchanges (vs 2 for unbucketed parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a bucketed+sorted parquet table registered in the
    session catalog (sorted within buckets: merge joins skip the sort)."""
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
