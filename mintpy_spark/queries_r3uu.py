"""Round-3 batch uu: day-of-week effect statistics on the daily series.

Day-of-week is computed as epoch_days % 7 (0 = Thursday, since
1970-01-01 was one) on BOTH engines — Spark's dayofweek() is
Sunday=1 while DuckDB's dayofweek() is Sunday=0, so the portable form
is pure integer arithmetic on the epoch day, not either builtin.
Weekend = dow0 IN (2, 3) (Saturday, Sunday).

* ``anova_dow_daily`` — one-way ANOVA F across the 7 dow groups of
  daily cents: is there a weekly seasonal effect at all?
* ``seasonal_index_dow`` — the classical seasonal index per dow
  (group mean over grand mean) as an EXACT rounded-integer-division
  basis-point value: S_g*n cross-multiplied against n_g*S, no float.
* ``welch_weekday_weekend`` — Welch's unequal-variance t between
  weekday and weekend dailies, with the Welch-Satterthwaite df. Every
  mean/variance comes from exact BIGINT (sum, sum-of-squares) pairs,
  so each double is a single deterministic division — no
  order-dependent float summation anywhere in the statistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

# Shared DuckDB scaffolding: daily cents + portable day-of-week.
_DAILY_DOW_SQL = """
    d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
               AS dow0,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS x
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3
    )
"""


def _daily_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    return ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        (F.datediff(F.to_date("ts"), F.lit("1970-01-01")) % 7).alias("dow0"),
    ).agg(
        F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("x")
    )


@_q(
    "anova_dow_daily",
    f"""
    WITH {_DAILY_DOW_SQL}, g AS (
      SELECT event_type, dow0,
             COUNT(*) AS ng,
             CAST(SUM(x) AS BIGINT) AS sg,
             CAST(SUM(x * x) AS BIGINT) AS qg
      FROM d GROUP BY 1, 2
    ), t AS (
      SELECT event_type,
             CAST(SUM(ng) AS BIGINT) AS n,
             COUNT(*) AS k,
             CAST(SUM(sg) AS BIGINT) AS s,
             CAST(SUM(qg) AS BIGINT) AS q,
             SUM(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                 / CAST(ng AS DOUBLE)) AS gsum
      FROM g GROUP BY 1
    )
    SELECT event_type, n AS n_days, CAST(k AS BIGINT) AS k_groups,
           ROUND(
             ((gsum - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
               / (k - 1))
             / ((CAST(q AS DOUBLE) - gsum) / (n - k)), 4) AS f_stat
    FROM t
    WHERE k >= 2 AND n > k
      AND CAST(q AS DOUBLE) - gsum > 0
    """,
)
def anova_dow_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F for a day-of-week effect on daily cents per
    event_type: SSB/(k-1) over SSW/(n-k) from per-group exact integer
    (count, sum, sum-of-squares) partials — ONE aggregate over the day
    table, then a <=7-row fold per type. Degenerate cases (one group,
    zero within-variance) are filtered, not NaN'd."""
    d = _daily_dow(spark, sf_dir)
    g = d.groupBy("event_type", "dow0").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("x").cast("long").alias("sg"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("qg"),
    )
    t = g.groupBy("event_type").agg(
        F.sum("ng").cast("long").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("sg").cast("long").alias("s"),
        F.sum("qg").cast("long").alias("q"),
        F.sum(
            F.col("sg").cast("double")
            * F.col("sg").cast("double")
            / F.col("ng").cast("double")
        ).alias("gsum"),
    )
    ssb = (
        F.col("gsum")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n").cast("double")
    )
    ssw = F.col("q").cast("double") - F.col("gsum")
    return (
        t.where((F.col("k") >= 2) & (F.col("n") > F.col("k")) & (ssw > 0))
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.col("k").cast("long").alias("k_groups"),
            F.round(
                (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 4
            ).alias("f_stat"),
        )
    )


@_q(
    "seasonal_index_dow",
    f"""
    WITH {_DAILY_DOW_SQL}, g AS (
      SELECT event_type, dow0,
             COUNT(*) AS ng, CAST(SUM(x) AS BIGINT) AS sg
      FROM d GROUP BY 1, 2
    ), t AS (
      SELECT event_type, CAST(SUM(ng) AS BIGINT) AS n,
             CAST(SUM(sg) AS BIGINT) AS s
      FROM g GROUP BY 1
    )
    SELECT g.event_type, CAST(g.dow0 AS BIGINT) AS dow0,
           CAST(g.ng AS BIGINT) AS n_days, g.sg AS cents,
           CAST((20000 * g.sg * t.n + g.ng * t.s)
                // (2 * g.ng * t.s) AS BIGINT) AS index_bp
    FROM g JOIN t ON g.event_type = t.event_type
    WHERE t.s > 0
    """,
)
def seasonal_index_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal index per (event_type, dow): group-mean over
    grand-mean in basis points, computed as the rounded INTEGER
    division (2*10000*S_g*n + n_g*S) DIV (2*n_g*S) — the ratio of two
    rational means without ever forming either. A flat series indexes
    ~10000 everywhere; weekend dips show directly. Positive-total
    types only (cents sums are nonnegative here; the guard documents
    the assumption rather than hiding a sign bug)."""
    d = _daily_dow(spark, sf_dir)
    g = d.groupBy("event_type", "dow0").agg(
        F.count(F.lit(1)).alias("ng"), F.sum("x").cast("long").alias("sg")
    )
    t = g.groupBy("event_type").agg(
        F.sum("ng").cast("long").alias("n"), F.sum("sg").cast("long").alias("s")
    )
    return (
        g.join(t, "event_type")
        .where(F.col("s") > 0)
        .select(
            "event_type",
            F.col("dow0").cast("long").alias("dow0"),
            F.col("ng").cast("long").alias("n_days"),
            F.col("sg").alias("cents"),
            F.expr("(20000 * sg * n + ng * s) DIV (2 * ng * s)")
            .cast("long")
            .alias("index_bp"),
        )
    )


@_q(
    "welch_weekday_weekend",
    f"""
    WITH {_DAILY_DOW_SQL}, g AS (
      SELECT event_type,
             CASE WHEN dow0 IN (2, 3) THEN 1 ELSE 0 END AS is_weekend,
             COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS q
      FROM d GROUP BY 1, 2
    ), wd AS (SELECT * FROM g WHERE is_weekend = 0 AND n >= 2),
       we AS (SELECT * FROM g WHERE is_weekend = 1 AND n >= 2),
    j AS (
      SELECT wd.event_type,
             CAST(wd.n AS BIGINT) AS n_wd, CAST(we.n AS BIGINT) AS n_we,
             CAST(wd.s AS DOUBLE) / wd.n AS m1,
             CAST(we.s AS DOUBLE) / we.n AS m2,
             (wd.n * CAST(wd.q AS DOUBLE) - CAST(wd.s AS DOUBLE) * wd.s)
               / (CAST(wd.n AS DOUBLE) * wd.n * (wd.n - 1)) AS se1,
             (we.n * CAST(we.q AS DOUBLE) - CAST(we.s AS DOUBLE) * we.s)
               / (CAST(we.n AS DOUBLE) * we.n * (we.n - 1)) AS se2
      FROM wd JOIN we ON wd.event_type = we.event_type
    )
    SELECT event_type, n_wd, n_we,
           ROUND(m1 - m2, 4) AS mean_diff,
           ROUND((m1 - m2) / sqrt(se1 + se2), 4) AS t_stat,
           ROUND((se1 + se2) * (se1 + se2)
                 / (se1 * se1 / (n_wd - 1) + se2 * se2 / (n_we - 1)), 4)
             AS df
    FROM j WHERE se1 + se2 > 0
    """,
)
def welch_weekday_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t between weekday and weekend daily cents per event_type
    (se_i = v_i/n_i computed in one fused expression from the exact
    integer sums, so both engines evaluate the identical float DAG).
    Output includes the Welch-Satterthwaite degrees of freedom; types
    need >= 2 days on each side and nonzero pooled variance."""
    d = _daily_dow(spark, sf_dir)
    g = d.groupBy(
        "event_type",
        F.when(F.col("dow0").isin(2, 3), 1).otherwise(0).alias("is_weekend"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
    )

    def side(flag: int, suffix: str) -> DataFrame:
        h = g.where((F.col("is_weekend") == flag) & (F.col("n") >= 2))
        se = (
            F.col("n") * F.col("q").cast("double") - F.col("s").cast("double") * F.col("s")
        ) / (F.col("n").cast("double") * F.col("n") * (F.col("n") - 1))
        return h.select(
            F.col("event_type").alias(f"et_{suffix}"),
            F.col("n").cast("long").alias(f"n_{suffix}"),
            (F.col("s").cast("double") / F.col("n")).alias(f"m_{suffix}"),
            se.alias(f"se_{suffix}"),
        )

    wd = side(0, "wd")
    we = side(1, "we")
    j = wd.join(we, F.col("et_wd") == F.col("et_we"))
    se_sum = F.col("se_wd") + F.col("se_we")
    return j.where(se_sum > 0).select(
        F.col("et_wd").alias("event_type"),
        "n_wd", "n_we",
        F.round(F.col("m_wd") - F.col("m_we"), 4).alias("mean_diff"),
        F.round((F.col("m_wd") - F.col("m_we")) / F.sqrt(se_sum), 4).alias("t_stat"),
        F.round(
            se_sum * se_sum
            / (
                F.col("se_wd") * F.col("se_wd") / (F.col("n_wd") - 1)
                + F.col("se_we") * F.col("se_we") / (F.col("n_we") - 1)
            ),
            4,
        ).alias("df"),
    )
