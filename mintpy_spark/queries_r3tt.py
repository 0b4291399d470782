"""Round-3 batch tt: TPC-H Q14/Q16/Q20 shapes on the slimmed schema.

* ``olap_promo_revenue_share`` — Q14: the promo share of one month's
  revenue as a single conditional aggregate over ONE scan (no
  numerator/denominator double-scan), share in rounded integer bp of
  exact cents-percent revenue.
* ``olap_part_supplier_census`` — Q16 shape (no partsupp table in the
  slimmed schema, so supplier-part relationships come from observed
  lineitems): distinct suppliers per (brand, size-band) excluding one
  brand, with the COUNT(DISTINCT) running per narrow pair key.
* ``olap_excess_supply_suppliers`` — Q20 shape: suppliers whose shipped
  1996 quantity of small parts exceeds 2x their own all-parts daily
  average for the year — the correlated-subquery form rewritten as one
  agg + an integer-cross-multiply compare (no double division).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load
from mintpy_spark.queries_r3pp import _REV_SQL


@_q(
    "olap_promo_revenue_share",
    f"""
    WITH j AS (
      SELECT p.p_type, {_REV_SQL} AS rev_cp
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
        AND l.l_shipdate < TIMESTAMP '1996-04-01'
    )
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_cp ELSE 0 END)
                AS BIGINT) AS promo_cp,
           CAST(SUM(rev_cp) AS BIGINT) AS total_cp,
           COUNT(*) AS n_items,
           CAST((20000 * SUM(CASE WHEN p_type = 'PROMO' THEN rev_cp
                                  ELSE 0 END)
                 + SUM(rev_cp)) // (2 * SUM(rev_cp)) AS BIGINT)
             AS promo_bp
    FROM j
    """,
)
def olap_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: March-1996 promo revenue share. One lineitem
    scan (ship-date filter pushed to parquet), part broadcast, and the
    numerator folds into the same aggregate as the denominator via a
    conditional sum — never two scans or a self-join. Exact cents-
    percent integers; the share is a rounded integer division."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-03-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.select("l_partkey", F.expr(_REV_SQL).alias("rev_cp")).join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", F.col("rev_cp")).otherwise(0)
    )
    return j.agg(
        promo.cast("long").alias("promo_cp"),
        F.sum("rev_cp").cast("long").alias("total_cp"),
        F.count(F.lit(1)).alias("n_items"),
        F.expr(
            "(20000 * SUM(CASE WHEN p_type = 'PROMO' THEN rev_cp ELSE 0 END)"
            " + SUM(rev_cp)) DIV (2 * SUM(rev_cp))"
        )
        .cast("long")
        .alias("promo_bp"),
    )


@_q(
    "olap_part_supplier_census",
    """
    SELECT p.p_brand, CAST((p.p_size - 1) // 10 AS BIGINT) AS size_band,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT) AS n_parts,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
    GROUP BY 1, 2
    """,
)
def olap_part_supplier_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape over observed supply relationships (the slimmed
    schema has no partsupp, so lineitem IS the supplier-part evidence):
    distinct suppliers and parts per (brand, 10-wide size band),
    excluding one brand. The two COUNT(DISTINCT)s expand to one
    partial-deduped aggregate per key (Spark plans expand + two-phase
    agg — distinct sets stay per-group, no global dedup); the brand
    filter rides the part broadcast before the join."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_brand") != "Brand#5")
        .select("p_partkey", "p_brand", "p_size")
    )
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    return j.groupBy(
        "p_brand", F.expr("CAST((p_size - 1) DIV 10 AS BIGINT)").alias("size_band")
    ).agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
        F.countDistinct("l_partkey").cast("long").alias("n_parts"),
        F.count(F.lit(1)).alias("n_items"),
    )


@_q(
    "olap_excess_supply_suppliers",
    """
    WITH small AS (
      SELECT l.l_suppkey,
             CAST(SUM(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS BIGINT)
               AS small_qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_size <= 10
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1
    ), allq AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
               AS total_qty,
             COUNT(*) AS n_ship
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, small.small_qty, allq.total_qty,
           CAST(allq.n_ship AS BIGINT) AS n_ship
    FROM small
    JOIN allq ON small.l_suppkey = allq.l_suppkey
    JOIN supplier s ON small.l_suppkey = s.s_suppkey
    WHERE 5 * small.small_qty * allq.n_ship > allq.total_qty * 100
    """,
)
def olap_excess_supply_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers whose 1996 small-part (size <= 10)
    volume is over 20x their per-shipment average across all parts —
    the correlated subquery becomes two map-combined aggregates joined
    on suppkey, and the threshold compares as the integer cross-product
    5*small*n > total*100 (0.2*avg without a double). Both aggregates
    shuffle once on the same suppkey, so AQE coalesces them into
    co-partitioned exchanges; supplier is a broadcast dim."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    qty = F.expr("CAST(floor(l_quantity + 0.5) AS BIGINT)")
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_size") <= 10)
        .select("p_partkey")
    )
    small = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(qty).cast("long").alias("small_qty"))
    )
    allq = li.groupBy("l_suppkey").agg(
        F.sum(qty).cast("long").alias("total_qty"),
        F.count(F.lit(1)).alias("n_ship"),
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    j = (
        small.join(allq.withColumnRenamed("l_suppkey", "sk"),
                   small.l_suppkey == F.col("sk"))
        .where(
            F.lit(5) * F.col("small_qty") * F.col("n_ship")
            > F.col("total_qty") * 100
        )
        .join(F.broadcast(s), small.l_suppkey == F.col("s_suppkey"))
    )
    return j.select(
        "s_suppkey", "s_name", "small_qty", "total_qty",
        F.col("n_ship").cast("long").alias("n_ship"),
    )
