"""Round-3 batch bbb: the four TPC-H shapes that complete the suite —
Q6, Q2, Q11, Q12 — recast where they need the absent partsupp table
(reference analog: the slimmed TPC-H schema in TESTDATA.md; reference
MintPy has no OLAP layer, these exercise the engine's join planner).

Exactness discipline: every money expression uses the repo's integer
cents idiom (floor(x*100+0.5) as BIGINT) so sums, argmins, and
HAVING thresholds are order-independent and cross-engine exact — no
float-sum last-ulp ambiguity between Spark's and DuckDB's fold order.

* ``olap_revenue_delta`` (Q6): one filtered scan, one global sum —
  the pushdown showcase (predicate reaches the parquet reader).
* ``olap_min_cost_supplier`` (Q2 shape): cheapest supplier per part
  via exact integer unit cost, dims broadcast, ties kept.
* ``olap_important_parts`` (Q11 shape): per-part value share with a
  global-total scalar threshold (broadcast 1-row join, not a window
  over one partition).
* ``olap_ship_priority_class`` (Q12 shape): late-vs-ontime shipping
  census split by high/low order priority (CASE-pivot aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

_CENTS = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_D100 = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
_QTY = "CAST(floor(l_quantity + 0.5) AS BIGINT)"


@_q(
    "olap_revenue_delta",
    f"""
    SELECT CAST(SUM({_CENTS} * {_D100}) AS BIGINT) AS revenue_c10k,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND {_D100} BETWEEN 5 AND 7
      AND {_QTY} < 24
    """,
)
def olap_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the would-be revenue increase from dropping a band of
    discounts. One scan with every predicate pushable (shipdate is a
    raw-column range that reaches PushedFilters; the discount/qty bands
    prune after the columnar read), then a single global integer sum —
    zero joins, one exchange for the final 1-row agg. Revenue is in
    cents x discount-percent units (c10k) to stay integer-exact."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    return (
        li.selectExpr(f"{_CENTS} AS c", f"{_D100} AS d", f"{_QTY} AS q")
        .where((F.col("d") >= 5) & (F.col("d") <= 7) & (F.col("q") < 24))
        .agg(
            F.sum(F.col("c") * F.col("d")).cast("long").alias("revenue_c10k"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_q(
    "olap_min_cost_supplier",
    f"""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM({_CENTS}) * 10000 // SUM({_QTY}) AS BIGINT) AS unit_c
      FROM lineitem GROUP BY 1, 2
    ), best AS (
      SELECT l_partkey, MIN(unit_c) AS min_c FROM cost GROUP BY 1
    )
    SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name,
           c.unit_c AS unit_cost_micro
    FROM cost c
    JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_c = b.min_c
    JOIN part p ON p.p_partkey = c.l_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size <= 10 AND p.p_type = 'PROMO'
    """,
)
def olap_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape on the slimmed schema (no partsupp): the observed
    unit cost per (part, supplier) from lineitem history, then the
    cheapest supplier(s) per small PROMO part. unit cost is exact
    integer micro-dollars (cents*10000 // qty) so the per-part argmin
    is fold-order independent; ties all survive, as in real Q2. The
    Spark side uses integral ``div`` (not float ``/`` + cast: a
    correctly-rounded double quotient can land one above the floor at
    an exact-integer boundary). Plan: one (part,supp) agg, a map-side
    partial min re-agg on l_partkey, the best-join co-partitioned on
    l_partkey, then three broadcast joins for part/supplier/nation."""
    li = load(spark, sf_dir, "lineitem").selectExpr(
        "l_partkey", "l_suppkey", f"{_CENTS} AS c", f"{_QTY} AS q"
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.expr("CAST((sum(c) * 10000) div sum(q) AS LONG)").alias("unit_c")
    )
    best = cost.groupBy("l_partkey").agg(F.min("unit_c").alias("min_c"))
    p = load(spark, sf_dir, "part").where(
        (F.col("p_size") <= 10) & (F.col("p_type") == "PROMO")
    ).select("p_partkey", "p_brand")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cost.join(best, "l_partkey")
        .where(F.col("unit_c") == F.col("min_c"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey", "p_brand", "s_name", "n_name",
            F.col("unit_c").alias("unit_cost_micro"),
        )
    )


@_q(
    "olap_important_parts",
    f"""
    WITH v AS (
      SELECT l.l_partkey, CAST(SUM({_CENTS}) AS BIGINT) AS value_c
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_regionkey = 0
      GROUP BY 1
    )
    SELECT l_partkey AS p_partkey, value_c
    FROM v
    WHERE value_c * 10000 > (SELECT SUM(value_c) FROM v) * 3
    """,
)
def olap_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp value -> lineitem revenue): parts whose
    region-0-supplied revenue exceeds 0.03% of that region's total.
    The global total is a broadcast 1-row crossJoin against the per-part
    aggregate (which Spark computes as a partial re-agg of the same
    shuffle, not a second scan); the threshold compare is pure integer
    cross-multiplication, so both engines agree bit-for-bit."""
    li = load(spark, sf_dir, "lineitem").selectExpr(
        "l_partkey", "l_suppkey", f"{_CENTS} AS c"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").where(F.col("n_regionkey") == 0).select(
        "n_nationkey"
    )
    v = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum("c").cast("long").alias("value_c"))
    )
    total = v.agg(F.sum("value_c").alias("total_c"))
    return (
        v.crossJoin(F.broadcast(total))
        .where(F.col("value_c") * 10000 > F.col("total_c") * 3)
        .select(F.col("l_partkey").alias("p_partkey"), "value_c")
    )


@_q(
    "olap_ship_priority_class",
    """
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 60
                THEN 'late' ELSE 'ontime' END AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def olap_ship_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode -> order-to-ship latency class): did
    late shipping hit urgent orders? CASE-pivot counts per latency
    class. The orders side projects two columns and shuffles on the
    join key once; the pivot is a map-side partial so the final
    exchange carries two rows per class."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60, "late"
            ).otherwise("ontime").alias("ship_class"),
            F.when(hi, 1).otherwise(0).alias("hi"),
            F.when(hi, 0).otherwise(1).alias("lo"),
        )
        .groupBy("ship_class")
        .agg(
            F.sum("hi").cast("long").alias("high_line_count"),
            F.sum("lo").cast("long").alias("low_line_count"),
        )
    )
