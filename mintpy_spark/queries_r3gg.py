"""Round-3 batch gg: z-order layout cells, KMV audience intersection,
and the TPC-H Q17 small-quantity join shape.

- ``zorder_cell_stats``: Morton-interleaved (series, day) cells — the
  layout key the Iceberg-style store sorts by for 2-D data skipping
  (operators/zorder.py; the skipping evidence itself is pytest-side
  with parquet row-group stats).
- ``kmv_audience_intersection``: theta-sketch intersection of per-type
  audience KMV sketches — distinct-overlap at 10^12 rows without a
  user-level shuffle (sketch per segment, tiny pair join).
- ``olap_small_qty_revenue``: TPC-H Q17 shape — revenue from orders
  below 20% of the part's average quantity; the threshold compare is
  pure integer (5*qty*cnt < sum_qty), never a double average.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.operators.sketch import kmv_intersect_estimate, kmv_set
from mintpy_spark.queries_r3 import KMV_K
from mintpy_spark.operators.zorder import zvalue, zvalue_sql
from mintpy_spark.queries import _q, load

_SPACE = 16**15

_Z_X = "(user_id % 64)"
_Z_Y_DUCK = "(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 64)"


@_q(
    "zorder_cell_stats",
    f"""
    WITH z AS (
      SELECT {zvalue_sql(_Z_X, _Z_Y_DUCK, 6, duck=True)} AS zv,
             {_Z_X} AS x, {_Z_Y_DUCK} AS y
      FROM events WHERE user_id IS NOT NULL
    )
    SELECT zv // 16 AS cell,
           COUNT(*) AS cnt,
           CAST(COUNT(DISTINCT x) AS BIGINT) AS nx,
           CAST(COUNT(DISTINCT y) AS BIGINT) AS ny,
           MIN(zv) AS zmin, MAX(zv) AS zmax
    FROM z GROUP BY 1
    """,
)
def zorder_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occupancy of 4x4 z-curve tiles over (series-bucket, day-bucket):
    each cell's nx/ny <= 4 and zmax-zmin <= 15 certify that the
    interleave keeps both dimensions locally bounded — the property the
    layout writer (zorder_layout) relies on for row-group pruning. Pure
    integer div/mod arithmetic, identical formula text on both engines."""
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .withColumn("x", F.expr("user_id % 64"))
        .withColumn(
            "y", (F.datediff(F.to_date("ts"), F.lit("1970-01-01")) % 64)
        )
    )
    z = ev.withColumn("zv", zvalue("x", "y", 6))
    return z.groupBy(F.expr("zv div 16").alias("cell")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("x").alias("nx"),
        F.countDistinct("y").alias("ny"),
        F.min("zv").alias("zmin"),
        F.max("zv").alias("zmax"),
    )


@_q(
    "kmv_audience_intersection",
    f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
      FROM events WHERE user_id IS NOT NULL
    ), r AS (
      SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      FROM h
    ), s AS (
      SELECT event_type, list_sort(list(hv)) AS kmv
      FROM r WHERE rn <= {KMV_K} GROUP BY 1
    ), p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.kmv AS ka, b.kmv AS kb,
             LEAST(CASE WHEN len(a.kmv) < {KMV_K} THEN {_SPACE}
                        ELSE a.kmv[-1] END,
                   CASE WHEN len(b.kmv) < {KMV_K} THEN {_SPACE}
                        ELSE b.kmv[-1] END) AS theta
      FROM s a JOIN s b ON a.event_type < b.event_type
    )
    SELECT type_a, type_b,
           CAST(len(ka) AS BIGINT) AS n_a,
           CAST(len(kb) AS BIGINT) AS n_b,
           theta,
           CAST(len(list_filter(list_intersect(ka, kb),
                                h -> h < theta)) AS BIGINT) AS n_sample,
           ROUND(CAST(len(list_filter(list_intersect(ka, kb),
                                      h -> h < theta)) AS DOUBLE)
                 * {_SPACE}.0::DOUBLE / CAST(theta AS DOUBLE), 2)
             AS est_common
    FROM p
    """,
)
def kmv_audience_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types from KMV sketches
    (theta intersection, operators/sketch.py). One distinct-agg per
    type, then a tiny sketch-pair join — the user set is never shuffled
    pairwise. The oracle rebuilds the identical sketches from raw rows."""
    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    s = kmv_set(ev, "user_id", key_cols=("event_type",), k=KMV_K)
    a = s.select(F.col("event_type").alias("type_a"), F.col("kmv").alias("kmv_a"))
    b = s.select(F.col("event_type").alias("type_b"), F.col("kmv").alias("kmv_b"))
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    return kmv_intersect_estimate(pairs, k=KMV_K)


@_q(
    "olap_small_qty_revenue",
    """
    WITH li AS (
      SELECT l_partkey,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem
    ), pf AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'
    ), j AS (
      SELECT li.l_partkey, li.qty, li.cents
      FROM li JOIN pf ON li.l_partkey = pf.p_partkey
    ), agg AS (
      SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS sum_qty,
             COUNT(*) AS cnt
      FROM j GROUP BY 1
    )
    SELECT CAST(COALESCE(SUM(j.cents), 0) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_items
    FROM j JOIN agg ON j.l_partkey = agg.l_partkey
    WHERE 5 * j.qty * agg.cnt < agg.sum_qty
    """,
)
def olap_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity orders for one brand): broadcast
    the filtered part keys, compute per-part quantity partials once, and
    compare 5*qty*cnt < sum_qty in exact integers (qty < 0.2*avg without
    a double division). Money stays in cents."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").alias("qty"),
        F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
    )
    pf = (
        load(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    j = li.join(F.broadcast(pf), li.l_partkey == pf.p_partkey).select(
        "l_partkey", "qty", "cents"
    )
    agg = j.groupBy("l_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    out = j.join(F.broadcast(agg), "l_partkey").where(
        F.lit(5) * F.col("qty") * F.col("cnt") < F.col("sum_qty")
    )
    return out.agg(
        F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )
