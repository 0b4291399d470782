"""Round-3 batch yy: TPC-H Q7/Q8/Q9 join shapes.

* ``olap_volume_shipping`` — Q7: cross-nation trade volume by
  (supplier nation, customer nation, ship year) for nations that
  DIFFER (the anti-local complement of Q5's local-supplier predicate).
* ``olap_market_share`` — Q8: one nation's share of yearly revenue
  among purchases by customers in its region — the two-level aggregate
  where the share folds into the same agg as the total via a
  conditional sum (no second scan, no self-join).
* ``olap_product_type_profit`` — Q9 shape (no partsupp cost in the
  slimmed schema, so "profit" is revenue): revenue by supplier nation x
  ship year over parts whose name carries one token (LIKE pushdown
  into the broadcast part dim).

All revenue stays in exact cents-percent BIGINTs (batch pp's _REV_SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load
from mintpy_spark.queries_r3pp import _REV_SQL


@_q(
    "olap_volume_shipping",
    f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_cp,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    WHERE s.s_nationkey <> c.c_nationkey
      AND ns.n_name IN ('NATION_1', 'NATION_2')
      AND nc.n_name IN ('NATION_1', 'NATION_2')
    GROUP BY 1, 2, 3
    """,
)
def olap_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between two nations by ship year,
    each direction its own group. The nation filters ride the broadcast
    supplier/customer-side dims so the fact join only carries qualifying
    rows; the inequality predicate is an extra join condition, not a
    post-join filter. Final agg is (2 x 2 - diagonal) x years groups."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", F.expr(_REV_SQL).alias("rev_cp")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nations = ("NATION_1", "NATION_2")
    n = load(spark, sf_dir, "nation")
    ns = n.where(F.col("n_name").isin(*nations)).select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    nc = n.where(F.col("n_name").isin(*nations)).select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sj = s.join(F.broadcast(ns), s.s_nationkey == F.col("snk"))
    cj = c.join(F.broadcast(nc), c.c_nationkey == F.col("cnk"))
    j = (
        li.join(F.broadcast(sj), li.l_suppkey == sj.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(
            cj,
            (o.o_custkey == cj.c_custkey) & (F.col("snk") != F.col("cnk")),
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation",
        F.year("l_shipdate").cast("long").alias("ship_year"),
    ).agg(
        F.sum("rev_cp").cast("long").alias("revenue_cp"),
        F.count(F.lit(1)).alias("n_items"),
    )


@_q(
    "olap_market_share",
    f"""
    WITH r AS (
      SELECT n_nationkey FROM nation
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ), j AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
             CASE WHEN ns.n_name = 'NATION_1' THEN 1 ELSE 0 END AS is_target,
             {_REV_SQL} AS rev_cp
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN r ON c.c_nationkey = r.n_nationkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    )
    SELECT order_year,
           CAST(SUM(CASE WHEN is_target = 1 THEN rev_cp ELSE 0 END)
                AS BIGINT) AS target_cp,
           CAST(SUM(rev_cp) AS BIGINT) AS total_cp,
           CAST((20000 * SUM(CASE WHEN is_target = 1 THEN rev_cp ELSE 0 END)
                 + SUM(rev_cp)) // (2 * SUM(rev_cp)) AS BIGINT) AS share_bp
    FROM j GROUP BY 1
    """,
)
def olap_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_1 suppliers' share of revenue sold to ASIA
    customers, per order year. The target/total split is a conditional
    sum inside ONE aggregate — the classic Q8 nested-CASE form — and the
    share is a rounded integer division of exact cents-percent sums.
    Region/nation/supplier broadcast; two fact shuffles (orderkey,
    custkey) as in Q5."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", F.expr(_REV_SQL).alias("rev_cp")
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").cast("long").alias("order_year")
    )
    n = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rn = n.join(F.broadcast(reg), n.n_regionkey == reg.r_regionkey).select(
        F.col("n_nationkey").alias("rnk_")
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cj = c.join(F.broadcast(rn), c.c_nationkey == F.col("rnk_")).select("c_custkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ns = n.select("n_nationkey", "n_name")
    sj = s.join(F.broadcast(ns), s.s_nationkey == ns.n_nationkey).select(
        "s_suppkey",
        F.when(F.col("n_name") == "NATION_1", 1).otherwise(0).alias("is_target"),
    )
    j = (
        li.join(F.broadcast(sj), li.l_suppkey == sj.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cj, o.o_custkey == cj.c_custkey)
    )
    return j.groupBy("order_year").agg(
        F.sum(F.when(F.col("is_target") == 1, F.col("rev_cp")).otherwise(0))
        .cast("long")
        .alias("target_cp"),
        F.sum("rev_cp").cast("long").alias("total_cp"),
        F.expr(
            "(20000 * SUM(CASE WHEN is_target = 1 THEN rev_cp ELSE 0 END)"
            " + SUM(rev_cp)) DIV (2 * SUM(rev_cp))"
        )
        .cast("long")
        .alias("share_bp"),
    )


@_q(
    "olap_product_type_profit",
    f"""
    SELECT ns.n_name AS supp_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_cp,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def olap_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (revenue standing in for profit — the slimmed
    schema carries no supply cost): widget-part revenue by supplier
    nation and ship year. The LIKE filter prunes the part dim BEFORE it
    broadcasts, so the fact scan joins against only matching partkeys;
    nation resolves through the supplier broadcast. One fact pass, one
    (nation, year) agg."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate", F.expr(_REV_SQL).alias("rev_cp")
    )
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sj = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).join(
        F.broadcast(sj), li.l_suppkey == sj.s_suppkey
    )
    return j.groupBy(
        "supp_nation", F.year("l_shipdate").cast("long").alias("ship_year")
    ).agg(
        F.sum("rev_cp").cast("long").alias("revenue_cp"),
        F.count(F.lit(1)).alias("n_items"),
    )
