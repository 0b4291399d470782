"""Round-3 batch ss: autocorrelation structure of the daily series —
ACF spectrum, Ljung-Box white-noise test, Hurst R/S exponent.

Exactness discipline: the daily series is revenue CENTS (exact BIGINT),
and every ACF term uses the n^2-scaled deviation y_t = n*x_t - S
(also exact BIGINT, no rational mean ever materialized): the lag-k
numerator sum(y_t * y_{t+k}) and denominator sum(y_t^2) are exact
integers whose one final double division is bit-identical on both
engines. Sums of integer-valued doubles stay exact below 2^53, so even
Spark's partition-order partial aggregation cannot fork a hash.

Reference analog: MintPy computes temporal autocorrelation of the
deramped time series to pick filtering windows (src/mintpy/
timeseries_rms.py residual analysis); here the same statistics run as
one pass over the tier aggregate instead of per-pixel numpy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

_MAXLAG = 14
_LB_LAGS = 7

# Shared DuckDB scaffolding: daily cents per type with the exact
# n^2-scaled deviations y_t and a 1-based day index t.
_DAILY_Y_SQL = """
    d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS x
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ), idx AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             SUM(x) OVER (PARTITION BY event_type) AS s
      FROM d
    ), y AS (
      SELECT event_type, t, n, CAST(n * x - s AS BIGINT) AS y
      FROM idx
    )
"""


def _daily_y(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("x")
    )
    wt = Window.partitionBy("event_type")
    idx = d.select(
        "event_type", "x",
        F.row_number().over(wt.orderBy("day")).alias("t"),
        F.count(F.lit(1)).over(wt).alias("n"),
        F.sum("x").over(wt).alias("s"),
    )
    return idx.select(
        "event_type", "t", "n",
        (F.col("n") * F.col("x") - F.col("s")).cast("long").alias("y"),
    )


@_q(
    "acf_lag_spectrum",
    f"""
    WITH {_DAILY_Y_SQL}, den AS (
      SELECT event_type, MAX(n) AS n,
             CAST(SUM(y * y) AS BIGINT) AS den
      FROM y GROUP BY 1
    ), num AS (
      SELECT a.event_type, l.lag,
             CAST(SUM(a.y * b.y) AS BIGINT) AS num
      FROM y a
      JOIN (SELECT CAST(UNNEST(range(1, {_MAXLAG + 1})) AS BIGINT) AS lag) l
        ON TRUE
      JOIN y b ON b.event_type = a.event_type AND b.t = a.t + l.lag
      GROUP BY 1, 2
    )
    SELECT num.event_type, num.lag,
           CAST(den.n AS BIGINT) AS n_days, num.num, den.den,
           ROUND(CAST(num.num AS DOUBLE) / CAST(den.den AS DOUBLE), 4) AS r
    FROM num JOIN den ON num.event_type = den.event_type
    WHERE den.den > 0
    """,
)
def acf_lag_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation r_k of the daily cents series at lags 1..14 per
    event_type: exact integer numerator/denominator columns plus the
    rounded ratio. The lag fan-out is a 14-row broadcast against the
    per-day AGGREGATE; the self-join matches t+k inside each type's
    retention-bounded day table — never raw events. A dominant weekly
    cycle shows as the r_7 > neighbors signature."""
    from mintpy_spark.plans.cache import persist_slot

    y = persist_slot(_daily_y(spark, sf_dir), _Y_SLOT)
    den = y.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_days"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("den"),
    )
    lags = y.sparkSession.range(1, _MAXLAG + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    a = y.select("event_type", "t", F.col("y").alias("ya"))
    b = y.select(
        F.col("event_type").alias("et_b"), F.col("t").alias("tb"),
        F.col("y").alias("yb"),
    )
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("et_b") == F.col("event_type"))
            & (F.col("tb") == F.col("t") + F.col("lag")),
        )
        .groupBy("event_type", "lag")
        .agg(F.sum(F.col("ya") * F.col("yb")).cast("long").alias("num"))
    )
    return (
        num.join(den, "event_type")
        .where(F.col("den") > 0)
        .select(
            "event_type", "lag", "n_days", "num", "den",
            F.round(
                F.col("num").cast("double") / F.col("den").cast("double"), 4
            ).alias("r"),
        )
    )


@_q(
    "ljung_box_daily",
    f"""
    WITH {_DAILY_Y_SQL}, den AS (
      SELECT event_type, MAX(n) AS n,
             CAST(SUM(y * y) AS BIGINT) AS den
      FROM y GROUP BY 1
    ), num AS (
      SELECT a.event_type, l.lag,
             CAST(SUM(a.y * b.y) AS BIGINT) AS num
      FROM y a
      JOIN (SELECT CAST(UNNEST(range(1, {_LB_LAGS + 1})) AS BIGINT) AS lag) l
        ON TRUE
      JOIN y b ON b.event_type = a.event_type AND b.t = a.t + l.lag
      GROUP BY 1, 2
    )
    SELECT num.event_type,
           CAST(den.n AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_lags,
           ROUND(den.n * (den.n + 2.0) * SUM(
             (CAST(num.num AS DOUBLE) / CAST(den.den AS DOUBLE))
             * (CAST(num.num AS DOUBLE) / CAST(den.den AS DOUBLE))
             / (den.n - num.lag)
           ), 4) AS q_stat
    FROM num JOIN den ON num.event_type = den.event_type
    WHERE den.den > 0 AND den.n > {_LB_LAGS}
    GROUP BY num.event_type, den.n, den.den
    """,
)
def ljung_box_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau statistic Q = n(n+2) * sum_k r_k^2/(n-k)
    over lags 1..7 on the daily cents series — the standard white-noise
    test (Q ~ chi^2_7 under H0; large Q = the series has structure worth
    a seasonal model). Each r_k is the bit-exact ratio of integer sums;
    the 7-term Q sum is rounded to 4 dp. Same two aggregate-sized joins
    as the ACF query."""
    from mintpy_spark.plans.cache import persist_slot

    y = persist_slot(_daily_y(spark, sf_dir), _Y_SLOT)
    den = y.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_days"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("den"),
    )
    lags = y.sparkSession.range(1, _LB_LAGS + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    a = y.select("event_type", "t", F.col("y").alias("ya"))
    b = y.select(
        F.col("event_type").alias("et_b"), F.col("t").alias("tb"),
        F.col("y").alias("yb"),
    )
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("et_b") == F.col("event_type"))
            & (F.col("tb") == F.col("t") + F.col("lag")),
        )
        .groupBy("event_type", "lag")
        .agg(F.sum(F.col("ya") * F.col("yb")).cast("long").alias("num"))
    )
    r = F.col("num").cast("double") / F.col("den").cast("double")
    return (
        num.join(den, "event_type")
        .where((F.col("den") > 0) & (F.col("n_days") > _LB_LAGS))
        .groupBy("event_type", "n_days", "den")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lags"),
            F.round(
                F.col("n_days")
                * (F.col("n_days") + 2.0)
                * F.sum(r * r / (F.col("n_days") - F.col("lag"))),
                4,
            ).alias("q_stat"),
        )
        .drop("den")
    )


@_q(
    "hurst_rs_daily",
    """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS x
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ), idx AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
               AS t0
      FROM d
    ), blk AS (
      SELECT i.event_type, w.w, i.t0 // w.w AS blk, i.t0, i.x,
             COUNT(*) OVER (PARTITION BY i.event_type, w.w, i.t0 // w.w)
               AS bn,
             SUM(i.x) OVER (PARTITION BY i.event_type, w.w, i.t0 // w.w)
               AS bs
      FROM idx i
      CROSS JOIN (SELECT CAST(UNNEST([8, 16]) AS BIGINT) AS w) w
    ), yb AS (
      SELECT event_type, w, blk,
             CAST(w * x - bs AS BIGINT) AS y, t0
      FROM blk WHERE bn = w
    ), cum AS (
      SELECT event_type, w, blk,
             SUM(y) OVER (PARTITION BY event_type, w, blk ORDER BY t0
                          ROWS UNBOUNDED PRECEDING) AS z,
             y
      FROM yb
    ), per_blk AS (
      SELECT event_type, w, blk,
             CAST(MAX(z) - MIN(z) AS BIGINT) AS r_y,
             CAST(SUM(y * y) AS BIGINT) AS ss
      FROM cum GROUP BY 1, 2, 3
    ), rs AS (
      SELECT event_type, w,
             COUNT(*) AS n_blocks,
             AVG(CAST(r_y AS DOUBLE) * sqrt(CAST(w AS DOUBLE)
                 / CAST(ss AS DOUBLE))) AS rs_mean
      FROM per_blk WHERE ss > 0 GROUP BY 1, 2
    )
    SELECT a.event_type,
           CAST(a.n_blocks AS BIGINT) AS blocks_8,
           CAST(b.n_blocks AS BIGINT) AS blocks_16,
           ROUND(a.rs_mean, 4) AS rs_8,
           ROUND(b.rs_mean, 4) AS rs_16,
           ROUND(ln(ROUND(b.rs_mean, 4) / ROUND(a.rs_mean, 4)) / ln(2.0), 4)
             AS hurst
    FROM rs a JOIN rs b
      ON a.event_type = b.event_type AND a.w = 8 AND b.w = 16
    WHERE a.rs_mean > 0
    """,
)
def hurst_rs_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range analysis on the daily cents
    series: full blocks of 8 and 16 days, per-block R/S from exact
    integers (R_y and sum(y^2) are BIGINTs of w-scaled deviations;
    R/S = R_y * sqrt(w / sum_y2) — one deterministic double per block),
    H = log2(RS_16/RS_8). H ~ 0.5 random walk, > 0.5 persistent trend,
    < 0.5 mean-reverting. The block windows run inside each type's day
    table; the x2 window fan-out is a 2-row broadcast literal."""
    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("x")
    )
    idx = d.select(
        "event_type", "x",
        (
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("day")
            )
            - 1
        ).alias("t0"),
    )
    ws = idx.sparkSession.createDataFrame([(8,), (16,)], "w long")
    blk = idx.crossJoin(F.broadcast(ws)).withColumn(
        "blk", F.expr("t0 DIV w")
    )
    wb = Window.partitionBy("event_type", "w", "blk")
    blk = blk.select(
        "event_type", "w", "blk", "t0", "x",
        F.count(F.lit(1)).over(wb).alias("bn"),
        F.sum("x").over(wb).alias("bs"),
    ).where(F.col("bn") == F.col("w"))
    yb = blk.select(
        "event_type", "w", "blk", "t0",
        (F.col("w") * F.col("x") - F.col("bs")).cast("long").alias("y"),
    )
    cum = yb.select(
        "event_type", "w", "blk", "y",
        F.sum("y")
        .over(
            wb.orderBy("t0").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("z"),
    )
    per_blk = cum.groupBy("event_type", "w", "blk").agg(
        (F.max("z") - F.min("z")).cast("long").alias("r_y"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ss"),
    )
    rs = (
        per_blk.where(F.col("ss") > 0)
        .groupBy("event_type", "w")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.avg(
                F.col("r_y").cast("double")
                * F.sqrt(F.col("w").cast("double") / F.col("ss").cast("double"))
            ).alias("rs_mean"),
        )
    )
    a = rs.where(F.col("w") == 8).select(
        "event_type",
        F.col("n_blocks").alias("blocks_8"),
        F.col("rs_mean").alias("rs8"),
    )
    b = rs.where(F.col("w") == 16).select(
        F.col("event_type").alias("et_b"),
        F.col("n_blocks").alias("blocks_16"),
        F.col("rs_mean").alias("rs16"),
    )
    return (
        a.join(b, F.col("event_type") == F.col("et_b"))
        .where(F.col("rs8") > 0)
        .select(
            "event_type",
            F.col("blocks_8").cast("long").alias("blocks_8"),
            F.col("blocks_16").cast("long").alias("blocks_16"),
            F.round("rs8", 4).alias("rs_8"),
            F.round("rs16", 4).alias("rs_16"),
            # ratio of the ROUNDED means: an ulp in the block average
            # cannot leak through the log into the 4th decimal
            F.round(
                F.log(F.round("rs16", 4) / F.round("rs8", 4))
                / F.log(F.lit(2.0)),
                4,
            ).alias("hurst"),
        )
    )


_Y_SLOT: list = []
