"""Round-3 batch hh: three more TPC-H optimizer shapes.

- ``olap_disjunctive_pushdown`` (Q19 shape): an OR-of-ANDs predicate
  across a join — Catalyst must push the common conjuncts to both scans
  and keep the disjunction as a post-join filter.
- ``olap_last_shipper_blame`` (Q21 shape on the available columns):
  EXISTS a co-supplier on the order AND NOT EXISTS a later-shipping
  co-supplier — a semi-join chased by an anti-join on the same key.
- ``olap_top_revenue_supplier`` (Q15 shape): revenue view + argmax,
  returning ALL suppliers tied at the max (the tie-safe formulation).

Money stays integer (cents, and cent-hundredths once the discount
multiplier is applied) — no double sums to hash-mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

_CENTS = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_D100 = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
_QTY = "CAST(floor(l_quantity + 0.5) AS BIGINT)"


@_q(
    "olap_disjunctive_pushdown",
    f"""
    SELECT CAST(SUM(c * (100 - d)) AS BIGINT) AS revenue_c100,
           COUNT(*) AS n_items
    FROM (
      SELECT {_CENTS} AS c, {_D100} AS d, {_QTY} AS q, l_partkey
      FROM lineitem
    ) li JOIN part p ON li.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND q BETWEEN 1  AND 11 AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#2' AND q BETWEEN 10 AND 20 AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#3' AND q BETWEEN 20 AND 30 AND p.p_size BETWEEN 1 AND 15)
    """,
)
def olap_disjunctive_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: the disjunction references both sides, so only the
    derived bounds (q <= 30, size <= 15, brand IN (...)) are pushable;
    the plan broadcast-joins part and evaluates the OR post-join.
    Revenue = cents * (100 - discount_pct) in exact integers."""
    li = load(spark, sf_dir, "lineitem").selectExpr(
        f"{_CENTS} AS c", f"{_D100} AS d", f"{_QTY} AS q", "l_partkey"
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("q").between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("q").between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("q").between(20, 30) & F.col("p_size").between(1, 15))
    )
    return j.where(cond).agg(
        F.sum(F.col("c") * (F.lit(100) - F.col("d"))).cast("long").alias("revenue_c100"),
        F.count(F.lit(1)).alias("n_items"),
    )


@_q(
    "olap_last_shipper_blame",
    """
    WITH l AS (
      SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem
    ), f AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND EXISTS (SELECT 1 FROM l l2
                    WHERE l2.l_orderkey = l.l_orderkey
                      AND l2.l_suppkey <> l.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM l l3
                        WHERE l3.l_orderkey = l.l_orderkey
                          AND l3.l_suppkey <> l.l_suppkey
                          AND l3.l_shipdate >= l.l_shipdate)
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM f JOIN supplier s ON f.l_suppkey = s.s_suppkey
    GROUP BY 1
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def olap_last_shipper_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape on the available columns: in finished multi-supplier
    orders, blame the supplier(s) whose latest lineitem shipped strictly
    after every co-supplier's. Spark plan: ONE per-order aggregation
    replaces both correlated subqueries — max shipdate per order among
    ALL suppliers and among OTHER suppliers derive from (order, supplier)
    partials, avoiding two self-joins of the fact table."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    per = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
        "l_orderkey", "l_suppkey"
    ).agg(F.max("l_shipdate").alias("my_max"))
    # order-level: count of suppliers, global max, and the 2nd-distinct
    # max (to know the best OTHER supplier without a self-join)
    ow = per.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.max("my_max").alias("omax"),
        F.max_by("l_suppkey", F.struct("my_max", "l_suppkey")).alias("argmax"),
        # F.get (not [1]): ANSI mode throws on out-of-bounds for the
        # single-supplier orders that are filtered only downstream
        F.get(F.sort_array(F.collect_list("my_max"), asc=False), 1).alias(
            "second"
        ),
    )
    j = per.join(ow, "l_orderkey").where(F.col("n_supp") > 1)
    # blame rows: my_max == omax (I shipped last or tied-last) AND no
    # OTHER supplier ships >= later: other_max = second if I am the
    # unique argmax else omax
    other_max = F.when(
        (F.col("my_max") == F.col("omax")) & (F.col("l_suppkey") == F.col("argmax")),
        F.col("second"),
    ).otherwise(F.col("omax"))
    f = j.where(F.col("my_max") > other_max).select("l_orderkey", "l_suppkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    out = f.join(F.broadcast(s), f.l_suppkey == s.s_suppkey).groupBy(
        "s_name"
    ).agg(F.count(F.lit(1)).alias("numwait"))
    return out.orderBy(F.desc("numwait"), F.asc("s_name")).limit(10)


@_q(
    "olap_top_revenue_supplier",
    f"""
    WITH r AS (
      SELECT l_suppkey,
             CAST(SUM({_CENTS} * (100 - {_D100})) AS BIGINT) AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.rev AS total_rev_c100
    FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.rev = (SELECT MAX(rev) FROM r)
    """,
)
def olap_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: quarterly revenue per supplier, return every supplier
    tied at the max. The max is a broadcast 1-row join, not a window
    over a single partition — tie-safe AND shuffle-free after the one
    revenue agg."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    r = li.selectExpr(
        "l_suppkey", f"{_CENTS} * (100 - {_D100}) AS rc"
    ).groupBy("l_suppkey").agg(F.sum("rc").cast("long").alias("rev"))
    mx = r.agg(F.max("rev").alias("mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        r.crossJoin(F.broadcast(mx))
        .where(F.col("rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("rev").alias("total_rev_c100"))
    )
