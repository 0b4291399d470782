"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The real implementations live in ``mintpy_spark.queries``; this module is a
thin adapter so the engine package stays importable on executors via
``spark-submit --py-files``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import mintpy_spark.queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: 3-tier rollup cascade of the events series at
    sf0.001 — 1h partials -> 1d -> 30d with derived means."""
    from pyspark.sql import functions as F

    from mintpy_spark.operators.rollup import cascade, rollup_from_obs, with_mean

    ev = Q.load(spark, "/root/testdata/sf0.001", "events")
    t1h = rollup_from_obs(ev, "value", "1h", key="user_id", ts="ts")
    t30 = cascade(cascade(t1h, "1d", key="user_id"), "30d", key="user_id")
    return with_mean(t30).orderBy("user_id", "bucket_start").select(
        "user_id", "bucket_start", "cnt", F.round("vsum", 2).alias("vsum"),
        "vmin", "vmax", F.round("vmean", 4).alias("vmean"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
