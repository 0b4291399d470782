"""Round-3 additions, batch x: three classic OLAP join shapes the
registry lacked (TPC-H Q4/Q13/Q22 analogs) and a week-over-week tier
delta.

* order-priority semi-join (Q4 shape) — EXISTS with a CORRELATED
  inequality (lineitem shipped > 60 days after its order's date):
  Spark's left_semi join with a compound condition, the shape that
  proves semi-join pushes the existence test into the join instead of
  a count-distinct dedup.
* customer order-count distribution (Q13 shape) — LEFT join preserving
  zero-order customers, then a histogram over the grouped counts: the
  two-level aggregation where the second agg's key is the first agg's
  value.
* idle rich customers (Q22 shape) — scalar-subquery threshold feeding
  an ANTI join.  All money flows in integer CENTS (floor(x*100 + 0.5))
  and the threshold is an integer division, so the cross-engine
  comparison never sits on a double half-point (memory: rounding traps).
* week-over-week change — self-join of the 1d tier on bucket_start - 7d;
  the ratio is computed over integer COUNTS (exact), with the 2-dp
  rounded value sum alongside for context.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load


@_q(
    "olap_order_priority_semijoin",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY 1
    """,
)
def olap_order_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one lineitem shipped more
    than 60 days after the order date, counted per priority.  The
    existence test is a LEFT SEMI join with a correlated inequality —
    one pass over lineitem, no count-distinct dedup of multiple matching
    lines.  Plan: date filter pushed to the orders scan, one shuffle
    per side on orderkey, |priorities|-bounded final agg."""
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    hit = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )


@_q(
    "olap_custdist",
    """
    WITH c_orders AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY 1
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY 1
    """,
)
def olap_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by how many orders
    they placed, INCLUDING the zero-order bucket (LEFT join, count of
    the nullable side).  Two-level aggregation where level 2 groups on
    level 1's measure.  Plan: one shuffle join on custkey, per-customer
    count with map-side combine, then a tiny histogram agg."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    ).select(F.col("c_count").cast("long").alias("c_count"), "custdist")


@_q(
    "olap_idle_rich_customers",
    """
    WITH cents AS (
      SELECT c_custkey, c_mktsegment,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
      FROM customer
    ), thr AS (
      SELECT CAST(SUM(bal_cents) // COUNT(*) AS BIGINT) AS t
      FROM cents WHERE bal_cents > 0
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           CAST(SUM(c.bal_cents) AS BIGINT) AS total_cents
    FROM cents c, thr
    WHERE c.bal_cents > thr.t
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY 1
    """,
)
def olap_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: LAPSED rich customers — above-average balance
    and no order since 1999 (every sf0.01 customer has ordered at least
    once, so the classic never-ordered form is empty; the lapsed form is
    the one a retention team actually runs).  A scalar-subquery
    threshold feeds an ANTI join against the recent-orders slice.  Money
    is integer cents end-to-end (floor(x*100 + 0.5), integer-division
    mean), so no double half-point can flip a row across engines.
    Plan: the positive-balance mean is a 1-row broadcast; the anti join
    shuffles on custkey; final agg is |segments|-bounded."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("bal_cents"),
    )
    thr = c.where(F.col("bal_cents") > 0).agg(
        F.expr("CAST(SUM(bal_cents) DIV COUNT(*) AS BIGINT)").alias("t")
    )
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    rich = c.crossJoin(F.broadcast(thr)).where(F.col("bal_cents") > F.col("t"))
    idle = rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_custs"),
        F.sum("bal_cents").cast("long").alias("total_cents"),
    )


@_q(
    "rollup_1d_wow_change",
    """
    WITH t AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
             COUNT(value) AS cnt,
             ROUND(SUM(value), 2) AS vsum
      FROM events GROUP BY 1
    )
    SELECT cur.bucket_start,
           CAST(cur.cnt AS BIGINT) AS cnt,
           cur.vsum,
           CAST(prev.cnt AS BIGINT) AS cnt_prev_week,
           CAST(floor((cur.cnt - prev.cnt) * 10000.0 / prev.cnt + 0.5)
                AS BIGINT) AS wow_cnt_bp
    FROM t cur
    JOIN t prev ON prev.bucket_start + INTERVAL 7 DAY = cur.bucket_start
    """,
)
def rollup_1d_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week change per day, computed FROM THE 1d TIER (not
    raw rows): self-join on bucket_start - 7d.  The change ratio uses
    integer counts (exact basis points); the 2-dp value sum rides along
    for context.  Days without a comparable day a week earlier emit no
    row (inner join) — restatement semantics, not zero-fill.  Plan: one
    tier build (single Exchange), then a self-join of the ~days-sized
    tier — broadcastable at any horizon (10 years = 3653 rows)."""
    ev = load(spark, sf_dir, "events")
    t = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("bucket_start"))
        .agg(
            F.count("value").cast("long").alias("cnt"),
            F.round(F.sum("value"), 2).alias("vsum"),
        )
    )
    cur, prev = t.alias("cur"), t.alias("prev")
    return cur.join(
        F.broadcast(prev),
        F.col("prev.bucket_start") + F.expr("INTERVAL 7 DAYS")
        == F.col("cur.bucket_start"),
    ).select(
        F.col("cur.bucket_start").alias("bucket_start"),
        F.col("cur.cnt").alias("cnt"),
        F.col("cur.vsum").alias("vsum"),
        F.col("prev.cnt").alias("cnt_prev_week"),
        F.floor(
            (F.col("cur.cnt") - F.col("prev.cnt"))
            * 10000.0
            / F.col("prev.cnt")
            + 0.5
        )
        .cast("long")
        .alias("wow_cnt_bp"),
    )
