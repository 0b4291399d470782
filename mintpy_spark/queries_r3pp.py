"""Round-3 batch pp: the three remaining classic TPC-H join shapes the
slimmed testdata schema supports — Q5 (local-supplier revenue through a
5-way join), Q10 (returned-item top customers), Q18 (large-volume
orders via a HAVING semi-join).

Money discipline shared by all three: revenue is computed as
``cents * (100 - disc_bp)`` where both factors are exact BIGINTs
recovered from the 2-dp inputs (floor(x*100+0.5)), so the sum is an
exact integer in cents-percent units on BOTH engines — no double
accumulation order can fork the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

# Exact-integer revenue: cents * (100 - discount basis points / 100).
_REV_SQL = (
    "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
    " * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"
)


def _rev_col() -> F.Column:
    return F.expr(_REV_SQL).alias("rev_cp")


@_q(
    "olap_local_supplier_revenue",
    f"""
    WITH li AS (
      SELECT l_orderkey, l_suppkey, {_REV_SQL} AS rev_cp FROM lineitem
    ), o AS (
      SELECT o_orderkey, o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
    )
    SELECT n.n_name,
           CAST(SUM(li.rev_cp) AS BIGINT) AS revenue_cp,
           COUNT(*) AS n_items
    FROM li
    JOIN o ON li.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON li.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY 1
    """,
)
def olap_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 1996 revenue per ASIA nation where the customer
    and the supplier share a nation (the "local supplier" predicate is
    an extra equi-condition on the supplier join, not a filter after
    it). Plan at scale: the date filter is pushed into the orders scan,
    supplier/nation/region are broadcast (supplier is dim-sized), and
    the only real shuffles are lineitem><orders on orderkey and
    ><customer on custkey — both map-side-combinable afterwards since
    the final agg is per-nation (25 groups)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _rev_col()
    )
    o = (
        load(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nr = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(nr), s.s_nationkey == F.col("n_nationkey"))
    )
    return j.groupBy("n_name").agg(
        F.sum("rev_cp").cast("long").alias("revenue_cp"),
        F.count(F.lit(1)).alias("n_items"),
    )


@_q(
    "olap_returned_items_top",
    f"""
    WITH rev AS (
      SELECT c.c_custkey, c.c_name, n.n_name,
             CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_cp,
             COUNT(*) AS n_items
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1996-07-01'
      GROUP BY 1, 2, 3
    ), r AS (
      SELECT *, row_number() OVER (ORDER BY revenue_cp DESC, c_custkey) AS rnk
      FROM rev
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, c_custkey, c_name, n_name,
           revenue_cp, n_items
    FROM r WHERE rnk <= 20
    """,
)
def olap_returned_items_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns
    (returnflag='R') in 1996H1. The ranking window never sees raw rows:
    revenue is aggregated per customer first, then Spark's
    TakeOrderedAndProject pulls the global top-20 of the AGGREGATE
    (per-partition top-20 partials, no single-partition sort of the
    customer table), and row_number runs over just those 20 rows.
    Deterministic under revenue ties via the custkey tiebreak."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    rev = (
        li.select("l_orderkey", _rev_col())
        .join(o.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.select("c_custkey", "c_name", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum("rev_cp").cast("long").alias("revenue_cp"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    top = rev.orderBy(F.desc("revenue_cp"), F.asc("c_custkey")).limit(20)
    w = Window.orderBy(F.desc("revenue_cp"), F.asc("c_custkey"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rnk"),
        "c_custkey", "c_name", "n_name", "revenue_cp", "n_items",
    )


@_q(
    "olap_large_volume_orders",
    """
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_qty
      FROM lineitem GROUP BY 1
      HAVING SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) > 300
    )
    SELECT c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents,
           big.sum_qty
    FROM big
    JOIN orders o ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def olap_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): the HAVING subquery is one
    map-side-combinable agg over lineitem; only qualifying orderkeys
    (sum_qty > 300, a sub-percent tail) flow into the orders/customer
    joins. The joins are left to AQE: the filtered agg is usually small
    enough that AQE converts both to broadcast at runtime, but we do
    not force it — at 10^12 rows the qualifying set can still exceed
    driver memory, and a shuffle join on the (orderkey, custkey) keys
    is the safe default. Quantities compare as exact integers."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").alias("qty"),
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qty").cast("long").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "total_cents"
        ),
    )
    c = load(spark, sf_dir, "customer").select("c_custkey")
    j = big.join(o, big.l_orderkey == o.o_orderkey).join(
        c, o.o_custkey == c.c_custkey
    )
    return j.select(
        "c_custkey", "o_orderkey", "o_orderdate", "total_cents", "sum_qty"
    )
