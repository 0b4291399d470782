"""Round-4 batch f: CUBE / grouping-sets coverage — the one relational
surface the OLAP suite didn't yet exercise. Spark's `cube()` +
`grouping_id()` against DuckDB's `GROUP BY CUBE` + `GROUPING()`, in the
integer cents x discount-percent (c10k) idiom so every subtotal level is
exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load


@_q(
    "olap_cube_revenue",
    """
    WITH f AS (
      SELECT n.n_name, c.c_mktsegment, o.o_orderkey,
             CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
               * (100 - CAST(FLOOR(l.l_discount * 100 + 0.5) AS BIGINT))
               AS rev_c10k
      FROM customer c
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    )
    SELECT n_name, c_mktsegment,
           CAST(GROUPING(n_name, c_mktsegment) AS BIGINT) AS gid,
           CAST(SUM(rev_c10k) AS BIGINT)  AS revenue_c10k,
           COUNT(DISTINCT o_orderkey)     AS n_orders
    FROM f
    GROUP BY CUBE (n_name, c_mktsegment)
    """,
)
def olap_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue cube over (nation, market segment): all four grouping-set
    levels — cell, per-nation, per-segment, grand total — in one pass,
    disambiguated by grouping_id. The c10k integer idiom keeps every
    subtotal byte-exact across engines.

    Scale: Spark expands CUBE into a single Expand + hash aggregate —
    one shuffle regardless of the number of grouping sets, with map-side
    partial aggregation; the dimension joins broadcast. This is the
    standard shape for tiered dashboard rollups (the relational analog
    of the engine's 1h/1d/30d tier cascade, reference
    stack.py:451 multilook levels).
    """
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    disc = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    f = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            "c_mktsegment",
            "o_orderkey",
            (cents * (F.lit(100) - disc)).alias("rev_c10k"),
        )
    )
    return (
        f.cube("n_name", "c_mktsegment")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.sum("rev_c10k").alias("revenue_c10k"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .select(
            "n_name", "c_mktsegment", "gid", "revenue_c10k", "n_orders"
        )
    )
