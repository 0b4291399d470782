"""Round-3 batch nn: experimentation analytics.

- ``cuped_adjusted_user``: CUPED variance reduction (Deng et al. 2013,
  public literature) — theta = cov(pre, post)/var(pre) from EXACT
  integer partials over users, one broadcast scalar join, identical
  adjustment expression on both engines.
- ``srm_chi2_daily``: sample-ratio-mismatch guardrail for a 50/50
  hash split: chi-square reduces to (n0-n1)^2 / n in rational
  arithmetic — the integer numerator and denominator are emitted
  alongside the one-division statistic.
- ``value_decile_bounds_weekly``: equi-depth decile boundaries per week
  (the stats a cost-based optimizer or an HDR-threshold pipeline
  consumes) — ntile over a TOTAL order (cents, event_id) so tile
  assignment is deterministic cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

_SPLIT_ED = 19738  # 2024-01-16: mid-corpus pre/post boundary (days 19723-19752)


@_q(
    "cuped_adjusted_user",
    f"""
    WITH per AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN date_diff('day', DATE '1970-01-01',
                                          CAST(ts AS DATE)) < {_SPLIT_ED}
                      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS pre,
             CAST(SUM(CASE WHEN date_diff('day', DATE '1970-01-01',
                                          CAST(ts AS DATE)) >= {_SPLIT_ED}
                      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS post
      FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
      GROUP BY 1
    ), g AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(pre) AS BIGINT)        AS sx,
             CAST(SUM(post) AS BIGINT)       AS sy,
             CAST(SUM(pre * post) AS BIGINT) AS sxy,
             CAST(SUM(pre * pre) AS BIGINT)  AS sxx
      FROM per
    )
    SELECT user_id, pre AS pre_cents, post AS post_cents,
           ROUND(CAST(post AS DOUBLE)
                 - (CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE))
                   * (CAST(pre AS DOUBLE) - CAST(sx AS DOUBLE)
                      / CAST(n AS DOUBLE)), 4) AS adj_cents
    FROM per, g
    """,
)
def cuped_adjusted_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted post-period spend per user: the covariate (pre
    period) is regressed out with theta from integer cross-products —
    order-free sums, so theta is bit-identical everywhere; one broadcast
    1-row join applies it."""
    ev = load(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    ed = F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
    cents = F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
    per = ev.groupBy("user_id").agg(
        F.sum(F.when(ed < _SPLIT_ED, cents).otherwise(0)).cast("long").alias("pre"),
        F.sum(F.when(ed >= _SPLIT_ED, cents).otherwise(0)).cast("long").alias("post"),
    )
    g = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pre").alias("sx"),
        F.sum("post").alias("sy"),
        F.sum(F.col("pre") * F.col("post")).alias("sxy"),
        F.sum(F.col("pre") * F.col("pre")).alias("sxx"),
    )
    j = per.crossJoin(F.broadcast(g))
    theta = F.expr(
        "CAST(n * sxy - sx * sy AS DOUBLE)"
        " / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE)"
    )
    adj = F.round(
        F.col("post").cast("double")
        - theta
        * (
            F.col("pre").cast("double")
            - F.col("sx").cast("double") / F.col("n").cast("double")
        ),
        4,
    )
    return j.select(
        "user_id",
        F.col("pre").alias("pre_cents"),
        F.col("post").alias("post_cents"),
        adj.alias("adj_cents"),
    )


@_q(
    "srm_chi2_daily",
    """
    WITH t AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)
              )::BIGINT % 2 AS grp
      FROM events WHERE user_id IS NOT NULL
    ), d AS (
      SELECT ed,
             CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      FROM t GROUP BY 1
    )
    SELECT ed, n0, n1,
           CAST((n0 - n1) * (n0 - n1) AS BIGINT) AS num,
           ROUND(CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
                 / CAST(n0 + n1 AS DOUBLE), 6) AS chi2
    FROM d
    """,
)
def srm_chi2_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch statistic per day for the 50/50 md5 hash
    split: chi-square collapses to (n0-n1)^2 / n — integer numerator
    emitted so the one double division is checkable."""
    from mintpy_spark.functions.scalars import portable_hash60

    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    t = ev.select(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("ed"),
        F.pmod(
            portable_hash60(F.col("user_id").cast("string")), F.lit(2)
        ).alias("grp"),
    )
    d = t.groupBy("ed").agg(
        F.sum((F.col("grp") == 0).cast("long")).cast("long").alias("n0"),
        F.sum((F.col("grp") == 1).cast("long")).cast("long").alias("n1"),
    )
    diff2 = (F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n1"))
    return d.select(
        "ed",
        "n0",
        "n1",
        diff2.cast("long").alias("num"),
        F.round(
            diff2.cast("double") / (F.col("n0") + F.col("n1")).cast("double"),
            6,
        ).alias("chi2"),
    )


@_q(
    "value_decile_bounds_weekly",
    """
    WITH t AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             event_id
      FROM events WHERE value IS NOT NULL
    ), n AS (
      SELECT wk, cents,
             ntile(10) OVER (PARTITION BY wk
                             ORDER BY cents, event_id) AS decile
      FROM t
    )
    SELECT wk, decile,
           COUNT(*) AS n,
           MIN(cents) AS lo_cents,
           MAX(cents) AS hi_cents
    FROM n GROUP BY 1, 2
    """,
)
def value_decile_bounds_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth decile boundaries per week: ntile over the TOTAL order
    (cents, event_id) so tile membership is deterministic; per-week
    partitions sort independently (no global sort)."""
    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    t = ev.select(
        F.expr("datediff(to_date(ts), DATE '1970-01-01') div 7").alias("wk"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        "event_id",
    )
    w = Window.partitionBy("wk").orderBy("cents", "event_id")
    n = t.withColumn("decile", F.ntile(10).over(w))
    return n.groupBy("wk", "decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
    )
