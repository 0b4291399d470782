"""Round-4 batch m: two family completions — nearest-direction as-of
alignment (the last missing member of the as-of family) and the ROLLUP
grouping-set hierarchy (region -> nation subtotals, the linear sibling
of the full CUBE in queries_r4f).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load


@_q(
    "asof_nearest_click",
    """
    WITH u AS (
      SELECT user_id, ts, event_id, 1 AS isp, CAST(NULL AS DOUBLE) AS v,
             epoch_us(ts) AS us
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, event_id, 0 AS isp, CAST(value AS DOUBLE) AS v,
             epoch_us(ts) AS us
      FROM events WHERE event_type = 'click'
    ),
    staged AS (
      SELECT user_id, ts, event_id, isp, us,
             last_value(CASE WHEN isp = 0 THEN {'t': us, 'v': v} END
                        IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, isp, event_id
               ROWS UNBOUNDED PRECEDING) AS prev,
             first_value(CASE WHEN isp = 0 THEN {'t': us, 'v': v} END
                         IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, isp, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
      FROM u
    )
    SELECT user_id, ts, event_id, us AS probe_us,
           CASE WHEN prev IS NULL AND nxt IS NULL THEN CAST(NULL AS DOUBLE)
                WHEN nxt IS NULL OR (prev IS NOT NULL
                     AND us - prev.t <= nxt.t - us) THEN prev.v
                ELSE nxt.v END AS v_nearest,
           CASE WHEN prev IS NULL AND nxt IS NULL THEN CAST(NULL AS BIGINT)
                WHEN nxt IS NULL OR (prev IS NOT NULL
                     AND us - prev.t <= nxt.t - us) THEN prev.t
                ELSE nxt.t END AS asof_ts_us,
           CASE WHEN prev IS NULL AND nxt IS NULL THEN CAST(NULL AS BIGINT)
                WHEN nxt IS NULL OR (prev IS NOT NULL
                     AND us - prev.t <= nxt.t - us) THEN us - prev.t
                ELSE nxt.t - us END AS dist_us,
           CASE WHEN prev IS NULL AND nxt IS NULL THEN 'none'
                WHEN nxt IS NULL OR (prev IS NOT NULL
                     AND us - prev.t <= nxt.t - us) THEN 'prev'
                ELSE 'next' END AS side
    FROM staged WHERE isp = 1
    """,
)
def asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every purchase aligned to its NEAREST click by |Δt| (backward
    wins ties) — pandas merge_asof(direction='nearest') / kdb aj
    semantics, completing the as-of family (backward / forward /
    tolerance / interpolate / nearest). Distances are exact integer
    microseconds; no float arithmetic anywhere, so the tie rule is
    engine-portable.

    Scale: identical plan to asof_join — one union, one shuffle on the
    key, one ordered window pass; no range join, no fan-out.
    """
    from mintpy_spark.operators.asof import asof_nearest

    ev = load(spark, sf_dir, "events")
    out = asof_nearest(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "click"),
        key="user_id", ts="ts", value_col="value",
        order_cols=("event_id",),
    )
    return out.select(
        "user_id", "ts", "event_id", "probe_us",
        "v_nearest", "asof_ts_us", "dist_us", "side",
    )


@_q(
    "olap_rollup_hierarchy",
    """
    WITH f AS (
      SELECT r.r_name, n.n_name,
             CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
               * (100 - CAST(FLOOR(l.l_discount * 100 + 0.5) AS BIGINT))
               AS rev_c10k
      FROM customer c
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    )
    SELECT r_name, n_name,
           CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
           CAST(SUM(rev_c10k) AS BIGINT) AS revenue_c10k,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM f
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def olap_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region -> nation revenue subtotals via ROLLUP: cell, per-region,
    and grand-total levels (the linear hierarchy sibling of the full
    CUBE, olap_cube_revenue) — one Expand + one shuffle, grouping_id-
    disambiguated, integer-c10k exact.

    Scale: Spark compiles ROLLUP into the same Expand + single
    hash-aggregate as CUBE with one fewer grouping set; all dimension
    joins broadcast. This is the dashboard drill-path query shape
    (continent -> country) every tiered rollup UI issues.
    """
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
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
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "r_name", "n_name",
            (cents * (F.lit(100) - disc)).alias("rev_c10k"),
        )
    )
    return (
        f.rollup("r_name", "n_name")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.sum("rev_c10k").alias("revenue_c10k"),
            F.count("*").cast("long").alias("n_lines"),
        )
        .select("r_name", "n_name", "gid", "revenue_c10k", "n_lines")
    )
