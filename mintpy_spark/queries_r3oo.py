"""Round-3 batch oo: conversion latency + difference-in-differences.

- ``time_to_convert_quantiles``: exact p50/p90 of the click->purchase
  latency per day — the as-of machinery driving a latency distribution;
  percentile interpolation is cross-engine-identical on identical
  integer microsecond multisets.
- ``did_estimator``: difference-in-differences over the hash-split
  pre/post design — four cell (sum, users) integer partials, the
  estimator assembled in ONE fixed-order double expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

_SPLIT_ED = 19738  # shared with batch nn (mid-corpus boundary)


@_q(
    "time_to_convert_quantiles",
    """
    WITH clicks AS (
      SELECT user_id, ts FROM events
      WHERE event_type = 'click' AND user_id IS NOT NULL
    ), purchases AS (
      SELECT user_id, ts FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL
    ), j AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(p.ts AS DATE)) AS ed,
             epoch_us(p.ts) - epoch_us(c.ts) AS delta_us
      FROM purchases p
      ASOF JOIN clicks c ON p.user_id = c.user_id AND c.ts <= p.ts
    ), r AS (
      SELECT ed, delta_us,
             row_number() OVER (PARTITION BY ed ORDER BY delta_us) AS rn,
             COUNT(*) OVER (PARTITION BY ed) AS n
      FROM j
    )
    SELECT ed, CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN rn = (n - 1) * 5 // 10 + 1
                         THEN delta_us END) AS BIGINT) AS p50_us,
           CAST(MAX(CASE WHEN rn = (n - 1) * 9 // 10 + 1
                         THEN delta_us END) AS BIGINT) AS p90_us
    FROM r GROUP BY 1
    """,
)
def time_to_convert_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click->purchase latency distribution per purchase day (purchases
    with no prior click excluded — inner as-of): exact integer
    microsecond deltas and DISCRETE percentiles (value at index
    (n-1)*q div 10 + 1) — interpolated quantiles at 4e11-microsecond
    magnitudes have ulp > 1e-4, so quantile_cont cannot round-stabilize
    cross-engine; the discrete rule stays in int64 end to end."""
    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(1).alias("is_click")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(0).alias("is_click")
    )
    u = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.desc("is_click"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = (
        u.withColumn(
            "click_ts",
            F.last(
                F.when(F.col("is_click") == 1, F.col("ts")), ignorenulls=True
            ).over(w),
        )
        .where((F.col("is_click") == 0) & F.col("click_ts").isNotNull())
        .select(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("ed"),
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("click_ts").cast("timestamp"))
            ).alias("delta_us"),
        )
    )
    wd = Window.partitionBy("ed")
    r = tagged.select(
        "ed",
        "delta_us",
        F.row_number().over(wd.orderBy("delta_us")).alias("rn"),
        F.count(F.lit(1)).over(wd).alias("n"),
    )
    idx50 = F.expr("(n - 1) * 5 div 10 + 1")
    idx90 = F.expr("(n - 1) * 9 div 10 + 1")
    return r.groupBy("ed").agg(
        F.max("n").cast("long").alias("n"),
        F.max(F.when(F.col("rn") == idx50, F.col("delta_us")))
        .cast("long").alias("p50_us"),
        F.max(F.when(F.col("rn") == idx90, F.col("delta_us")))
        .cast("long").alias("p90_us"),
    )


@_q(
    "did_estimator",
    f"""
    WITH t AS (
      SELECT ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)
              )::BIGINT % 2 AS grp,
             CASE WHEN date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       >= {_SPLIT_ED} THEN 1 ELSE 0 END AS period,
             user_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
    ), cell AS (
      SELECT grp, period,
             CAST(SUM(cents) AS BIGINT) AS y,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n
      FROM t GROUP BY 1, 2
    ), wide AS (
      SELECT
        MAX(CASE WHEN grp = 1 AND period = 1 THEN y END) AS yt1,
        MAX(CASE WHEN grp = 1 AND period = 1 THEN n END) AS nt1,
        MAX(CASE WHEN grp = 1 AND period = 0 THEN y END) AS yt0,
        MAX(CASE WHEN grp = 1 AND period = 0 THEN n END) AS nt0,
        MAX(CASE WHEN grp = 0 AND period = 1 THEN y END) AS yc1,
        MAX(CASE WHEN grp = 0 AND period = 1 THEN n END) AS nc1,
        MAX(CASE WHEN grp = 0 AND period = 0 THEN y END) AS yc0,
        MAX(CASE WHEN grp = 0 AND period = 0 THEN n END) AS nc0
      FROM cell
    )
    SELECT yt1, nt1, yt0, nt0, yc1, nc1, yc0, nc0,
           ROUND((CAST(yt1 AS DOUBLE) / CAST(nt1 AS DOUBLE)
                  - CAST(yt0 AS DOUBLE) / CAST(nt0 AS DOUBLE))
                 - (CAST(yc1 AS DOUBLE) / CAST(nc1 AS DOUBLE)
                    - CAST(yc0 AS DOUBLE) / CAST(nc0 AS DOUBLE)), 6)
             AS did_cents
    FROM wide
    """,
)
def did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on mean spend per active user across
    the hash split and the pre/post boundary: the four cells are integer
    (sum, distinct-user) partials; the estimator is one fixed-order
    double expression over them — every input to the division is exact,
    so the statistic is bit-identical cross-engine."""
    from mintpy_spark.functions.scalars import portable_hash60

    ev = load(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    t = ev.select(
        F.pmod(
            portable_hash60(F.col("user_id").cast("string")), F.lit(2)
        ).alias("grp"),
        (
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")) >= _SPLIT_ED
        ).cast("int").alias("period"),
        "user_id",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    cell = t.groupBy("grp", "period").agg(
        F.sum("cents").cast("long").alias("y"),
        F.countDistinct("user_id").cast("long").alias("n"),
    )

    def pick(g, p, c):
        return F.max(
            F.when((F.col("grp") == g) & (F.col("period") == p), F.col(c))
        )

    wide = cell.agg(
        pick(1, 1, "y").alias("yt1"), pick(1, 1, "n").alias("nt1"),
        pick(1, 0, "y").alias("yt0"), pick(1, 0, "n").alias("nt0"),
        pick(0, 1, "y").alias("yc1"), pick(0, 1, "n").alias("nc1"),
        pick(0, 0, "y").alias("yc0"), pick(0, 0, "n").alias("nc0"),
    )
    did = F.round(
        (
            F.col("yt1").cast("double") / F.col("nt1").cast("double")
            - F.col("yt0").cast("double") / F.col("nt0").cast("double")
        )
        - (
            F.col("yc1").cast("double") / F.col("nc1").cast("double")
            - F.col("yc0").cast("double") / F.col("nc0").cast("double")
        ),
        6,
    )
    return wide.select("*", did.alias("did_cents"))
