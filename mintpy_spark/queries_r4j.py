"""Round-4 batch j: survival and nonparametric-test coverage.

* survival_km_risk_table — the Kaplan-Meier sufficient statistics
  (distinct event time, at-risk count, deaths, censorings) as exact
  integers; the survival curve itself is a product of (1 - d/n) over
  these rows, so shipping the risk table keeps the oracle float-free.
* mannwhitney_wkday_wkend — Mann-Whitney U between weekday and weekend
  observations in the BINNED form: ranks come from cumulative counts
  over distinct values (the engine's 2-dp value grid), never from a
  corpus-sized row sort, and doubled rank sums keep tie midpoints
  integer.

Complements the parametric drift family (Welch/ANOVA, queries_r3uu) and
the hazard/cohort queries (queries_r3u/r3o) with the two classic
distribution-free tools they skip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load


@_q(
    "survival_km_risk_table",
    """
    WITH span AS (
      SELECT user_id,
             (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 86400000000
               AS lifetime_d,
             MAX(ts) AS last_ts
      FROM events GROUP BY 1
    ), horizon AS (
      SELECT MAX(last_ts) AS h FROM span
    ), lab AS (
      SELECT s.user_id, s.lifetime_d,
             CASE WHEN epoch_us(h.h) - epoch_us(s.last_ts)
                       >= 7 * 86400000000 THEN 1 ELSE 0 END AS died
      FROM span s CROSS JOIN horizon h
    ), grid AS (
      SELECT lifetime_d,
             CAST(SUM(died) AS BIGINT) AS d_events,
             CAST(SUM(1 - died) AS BIGINT) AS c_censored
      FROM lab GROUP BY 1
    )
    SELECT lifetime_d, d_events, c_censored,
           CAST(SUM(d_events + c_censored)
                OVER (ORDER BY lifetime_d DESC
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_at_risk
    FROM grid
    """,
)
def survival_km_risk_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier risk table over user lifetimes: lifetime = whole days
    between a user's first and last event; a user whose last event
    precedes the global horizon by >= 7 days is an observed churn
    (death), otherwise right-censored at their lifetime. Each distinct
    lifetime row carries deaths, censorings, and the at-risk count
    (everyone with lifetime >= d) — the exact-integer sufficient
    statistics of the KM estimator S(t) = prod(1 - d_i/n_i).

    Reference analog: the drop/keep retention flags (operators/
    retention.py mirrors §2.2) reason about series lifetime; the KM
    table is the censoring-aware population view product analytics
    builds on it.

    Scale: two key-partitioned aggregations plus a window over DISTINCT
    lifetimes (calendar-sized, not user-sized); the horizon is a 1-row
    broadcast.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    span = ev.groupBy("user_id").agg(
        F.floor(
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            / F.lit(86_400_000_000)
        )
        .cast("long")
        .alias("lifetime_d"),
        F.max("ts").alias("last_ts"),
    )
    horizon = span.agg(F.max("last_ts").alias("h"))
    lab = span.crossJoin(F.broadcast(horizon)).select(
        "lifetime_d",
        F.when(
            F.unix_micros(F.col("h")) - F.unix_micros(F.col("last_ts"))
            >= F.lit(7 * 86_400_000_000),
            1,
        )
        .otherwise(0)
        .alias("died"),
    )
    grid = lab.groupBy("lifetime_d").agg(
        F.sum("died").cast("long").alias("d_events"),
        F.sum(1 - F.col("died")).cast("long").alias("c_censored"),
    )
    w = Window.orderBy(F.col("lifetime_d").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return grid.select(
        "lifetime_d",
        "d_events",
        "c_censored",
        F.sum(F.col("d_events") + F.col("c_censored"))
        .over(w)
        .cast("long")
        .alias("n_at_risk"),
    )


@_q(
    "mannwhitney_wkday_wkend",
    """
    WITH obs AS (
      SELECT value,
             CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS wkend
      FROM events WHERE value IS NOT NULL
    ), bins AS (
      SELECT value,
             CAST(SUM(wkend) AS BIGINT)     AS n_we,
             CAST(SUM(1 - wkend) AS BIGINT) AS n_wd,
             CAST(COUNT(*) AS BIGINT)       AS n
      FROM obs GROUP BY 1
    ), ranked AS (
      SELECT n_we, n_wd, n,
             COALESCE(SUM(n) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM bins
    )
    SELECT CAST(SUM(n_wd) AS BIGINT) AS n1,
           CAST(SUM(n_we) AS BIGINT) AS n2,
           CAST(SUM(n_wd * (2 * cum_before + n + 1))
                - SUM(n_wd) * (SUM(n_wd) + 1) AS BIGINT) AS u1_x2,
           CAST(SUM(n_we * (2 * cum_before + n + 1))
                - SUM(n_we) * (SUM(n_we) + 1) AS BIGINT) AS u2_x2,
           CAST(SUM(n * n * n - n) AS BIGINT) AS tie_term
    FROM ranked
    """,
)
def mannwhitney_wkday_wkend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U between weekday and weekend event values, exact
    integers: doubled rank sums (2 * avg tie rank = 2*cum_before + n + 1
    is always integral) give u1_x2 = 2*U1 and u2_x2 = 2*U2 with
    u1_x2 + u2_x2 = 2*n1*n2; tie_term = sum(t^3 - t) feeds the normal
    approximation's variance correction downstream.

    Scale: ranks come from cumulative counts over DISTINCT values — the
    engine's 2-dp grid bounds the bins (49k at sf0.01), so the only
    ordered pass is bin-sized, not observation-sized. The observation
    scan is one map-side-combining aggregation.
    """
    # NULL guard on BOTH sides: Spark windows order NULLs first while
    # DuckDB defaults to NULLS LAST, so an unguarded NULL value would
    # shift every bin's cumulative rank differently per engine
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "value",
            F.when(F.dayofweek("ts").isin(1, 7), 1)
            .otherwise(0)
            .alias("wkend"),
        )
    )
    bins = ev.groupBy("value").agg(
        F.sum("wkend").cast("long").alias("n_we"),
        F.sum(1 - F.col("wkend")).cast("long").alias("n_wd"),
        F.count("*").cast("long").alias("n"),
    )
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = bins.select(
        "n_we",
        "n_wd",
        "n",
        F.coalesce(F.sum("n").over(w), F.lit(0)).alias("cum_before"),
    )
    avg2 = 2 * F.col("cum_before") + F.col("n") + 1
    return ranked.agg(
        F.sum("n_wd").cast("long").alias("n1"),
        F.sum("n_we").cast("long").alias("n2"),
        (
            F.sum(F.col("n_wd") * avg2)
            - F.sum("n_wd") * (F.sum("n_wd") + 1)
        )
        .cast("long")
        .alias("u1_x2"),
        (
            F.sum(F.col("n_we") * avg2)
            - F.sum("n_we") * (F.sum("n_we") + 1)
        )
        .cast("long")
        .alias("u2_x2"),
        F.sum(F.col("n") * F.col("n") * F.col("n") - F.col("n"))
        .cast("long")
        .alias("tie_term"),
    )
