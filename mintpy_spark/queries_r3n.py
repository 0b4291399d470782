"""Round-3 additions, batch n: Holt linear-trend forecast skill (an
iterative algorithm that still hash-matches a SQL oracle via a recursive
CTE and dyadic smoothing constants), a 3-step conversion funnel, and the
exact rolling median temporal filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

_HOLT_ORACLE = """
    WITH RECURSIVE daily AS (
      SELECT event_type AS key, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), seq AS (
      SELECT key, y,
             CAST(ROW_NUMBER() OVER (PARTITION BY key ORDER BY day) AS BIGINT) AS t,
             CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT) AS n
      FROM daily
    ), lim AS (
      SELECT key, MAX(n) - 7 AS n_train FROM seq GROUP BY key
      HAVING MAX(n) - 7 >= 2
    ), r AS (
      SELECT s1.key, CAST(2 AS BIGINT) AS t,
             CAST(s2.y AS DOUBLE) AS l,
             CAST(s2.y AS DOUBLE) - CAST(s1.y AS DOUBLE) AS b
      FROM seq s1
      JOIN seq s2 ON s2.key = s1.key AND s2.t = 2
      JOIN lim ON lim.key = s1.key
      WHERE s1.t = 1
      UNION ALL
      SELECT r.key, r.t + 1,
             0.5::DOUBLE * s.y + 0.5::DOUBLE * (r.l + r.b),
             0.25::DOUBLE * ((0.5::DOUBLE * s.y + 0.5::DOUBLE * (r.l + r.b)) - r.l)
               + 0.75::DOUBLE * r.b
      FROM r
      JOIN seq s ON s.key = r.key AND s.t = r.t + 1
      JOIN lim ON lim.key = r.key
      WHERE r.t + 1 <= lim.n_train
    ), fin AS (
      SELECT r.key, r.l, r.b FROM r JOIN lim ON lim.key = r.key
      WHERE r.t = lim.n_train
    ), den AS (
      SELECT s.key, CAST(SUM(ABS(s.y - p.y)) AS BIGINT) AS denom
      FROM seq s
      JOIN seq p ON p.key = s.key AND p.t = s.t - 1
      JOIN lim ON lim.key = s.key
      WHERE s.t >= 2 AND s.t <= lim.n_train
      GROUP BY s.key
    ), err AS (
      SELECT s.key,
             CAST(floor(abs(CAST(s.y AS DOUBLE)
                            - (fin.l + CAST(s.t - lim.n_train AS DOUBLE) * fin.b))
                        * 1e6 + 0.5) AS BIGINT) AS e
      FROM seq s
      JOIN lim ON lim.key = s.key
      JOIN fin ON fin.key = s.key
      WHERE s.t > lim.n_train
    ), se AS (
      SELECT key, CAST(SUM(e) AS BIGINT) AS sum_abs_err_micro
      FROM err GROUP BY key
    )
    SELECT fin.key AS key, lim.n_train AS n_train, CAST(7 AS BIGINT) AS n_test,
           CAST(floor(fin.l * 1e6 + 0.5) AS BIGINT) AS l_end_micro,
           CAST(floor(fin.b * 1e6 + 0.5) AS BIGINT) AS b_end_micro,
           den.denom AS denom,
           se.sum_abs_err_micro AS sum_abs_err_micro,
           CASE WHEN den.denom > 0 THEN
             CAST(floor(
               (CAST(se.sum_abs_err_micro AS DOUBLE)
                  * CAST(lim.n_train - 1 AS DOUBLE))
               / (CAST(7 AS DOUBLE) * CAST(den.denom AS DOUBLE) * 1e6)
               * 1e6 + 0.5) AS BIGINT)
           ELSE NULL END AS mase_micro
    FROM fin
    JOIN lim ON lim.key = fin.key
    JOIN den ON den.key = fin.key
    JOIN se ON se.key = fin.key
"""


@_q("forecast_holt_mase", _HOLT_ORACLE)
def forecast_holt_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential-smoothing forecast skill per event stream,
    MASE-scored on a 7-day holdout (operators/forecast.holt_linear_mase_daily).
    The level/trend fold runs in applyInPandas with dyadic smoothing
    constants and per-step expression trees mirrored exactly by the
    oracle's recursive CTE — every recursion step is bit-identical IEEE
    arithmetic, so an inherently iterative algorithm still hash-matches
    pure SQL. Complements forecast_snaive_mase (the baseline it should
    beat on trending series)."""
    from mintpy_spark.operators.forecast import holt_linear_mase_daily

    ev = load(spark, sf_dir, "events")
    return holt_linear_mase_daily(ev, key="event_type", ts="ts", horizon=7)


@_q(
    "funnel_3step",
    """
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS ts1 FROM events
      WHERE event_type = 'click' GROUP BY user_id
    ), t2 AS (
      SELECT e.user_id, MIN(e.ts) AS ts2
      FROM events e JOIN t1 ON t1.user_id = e.user_id
      WHERE e.event_type = 'view' AND e.ts > t1.ts1
      GROUP BY e.user_id
    ), t3 AS (
      SELECT e.user_id, MIN(e.ts) AS ts3
      FROM events e JOIN t2 ON t2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
      GROUP BY e.user_id
    )
    SELECT
      (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events) AS users,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t1) AS step1_click,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t2) AS step2_view,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t3) AS step3_purchase,
      (SELECT CAST(COALESCE(SUM(epoch_us(t3.ts3) - epoch_us(t1.ts1)), 0) AS BIGINT)
       FROM t3 JOIN t1 ON t1.user_id = t3.user_id) AS conv_us_total
    """,
)
def funnel_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel (click -> later view -> later
    purchase) — the product-analytics query every event pipeline runs.
    Step semantics are sequential minima: ts1 = first click, ts2 = first
    view AFTER ts1, ts3 = first purchase AFTER ts2; plus the summed
    click->purchase conversion time over completers (exact integer
    microseconds). Plan: ONE scan and ONE user_id shuffle — the three
    dependent minima chain as whole-partition windows over the SAME
    partitioning (ts2's predicate reads ts1's window column, so each step
    sees the previous step's result without a join), then a groupBy on
    the window key reuses the clustering and a final scalar agg reduces
    one row per user. The oracle's join-chain spelling is the proof the
    single-pass form is exact."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    et, ts = F.col("event_type"), F.col("ts")
    per_row = (
        ev.select("user_id", "ts", "event_type")
        .withColumn("ts1", F.min(F.when(et == "click", ts)).over(w))
        .withColumn(
            "ts2", F.min(F.when((et == "view") & (ts > F.col("ts1")), ts)).over(w)
        )
        .withColumn(
            "ts3",
            F.min(F.when((et == "purchase") & (ts > F.col("ts2")), ts)).over(w),
        )
    )
    per_user = per_row.groupBy("user_id").agg(
        F.first("ts1").alias("ts1"),
        F.first("ts2").alias("ts2"),
        F.first("ts3").alias("ts3"),
    )
    dur = F.unix_micros(F.col("ts3").cast("timestamp")) - F.unix_micros(
        F.col("ts1").cast("timestamp")
    )
    return per_user.agg(
        F.count("*").cast("long").alias("users"),
        F.count("ts1").cast("long").alias("step1_click"),
        F.count("ts2").cast("long").alias("step2_view"),
        F.count("ts3").cast("long").alias("step3_purchase"),
        F.coalesce(F.sum(F.when(F.col("ts3").isNotNull(), dur)), F.lit(0))
        .cast("long")
        .alias("conv_us_total"),
    )


@_q(
    "temporal_filter_runmedian",
    """
    SELECT user_id, ts,
           median(value) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 3 DAY PRECEDING AND INTERVAL 3 DAY FOLLOWING
           ) AS wmed,
           COUNT(value) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 3 DAY PRECEDING AND INTERVAL 3 DAY FOLLOWING
           ) AS wcnt
    FROM events
    """,
)
def temporal_filter_runmedian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """±3-day rolling MEDIAN over the irregular series — the outlier-robust
    temporal filter mode (reference stack.py:522-528 median kernel; twin of
    temporal_filter_runmean). Exact percentile over a microsecond-precision
    range frame: Spark `percentile(0.5)` and DuckDB `median` interpolate
    identically on identical window multisets, so the raw double is
    hash-exact with no rounding. operators/filters.running_median is the
    collect-based equivalent for engines without percentile-over-window."""
    from mintpy_spark.operators.filters import _range_window

    ev = load(spark, sf_dir, "events")
    w = _range_window("user_id", "ts", 3.0)
    return ev.select(
        "user_id",
        "ts",
        F.percentile(F.col("value"), F.lit(0.5)).over(w).alias("wmed"),
        F.count("value").over(w).alias("wcnt"),
    )
