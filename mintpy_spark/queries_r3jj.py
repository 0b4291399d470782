"""Round-3 batch jj: bootstrap velocity uncertainty + rolling slope.

- ``velocity_bootstrap``: the reference's bootstrap velocity-uncertainty
  option (`timeseries2velocity.py` --bootstrap: resample epochs with
  replacement, refit, take the spread) made ORACLE-EXACT: resample
  indices are a pure function of (key, replicate, position) via the
  portable 60-bit md5 hash, and every regression partial is integer
  (day index x cents), so both engines produce bit-identical replicate
  velocities — the spread is the caller's one aggregation.
- ``velocity_rolling_30d``: per-series trailing-30-day LS slope — the
  page-change-velocity signal as a continuous rolling fit, integer
  RANGE-frame window sums, one double division per row.

Both use the closed-form slope (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx) over
EXACT int64 partials (order-free sums — engine summation order can
never flip a ulp), with ONE double division at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

_B = 8  # bootstrap replicates


@_q(
    "velocity_bootstrap",
    f"""
    WITH obs AS (
      SELECT user_id, event_id, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
    ), numbered AS (
      SELECT user_id, cents,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               - MIN(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
                 OVER (PARTITION BY user_id) AS di,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM obs
    ), grid AS (
      SELECT user_id, n, b, i,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':'
                || CAST(b AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 15)
              )::BIGINT % n + 1 AS idx
      FROM (SELECT DISTINCT user_id, n FROM numbered),
           unnest(generate_series(1, {_B})) AS tb(b),
           LATERAL unnest(generate_series(1, n)) AS ti(i)
    ), samp AS (
      SELECT g.user_id, g.b, r.di, r.cents
      FROM grid g JOIN numbered r
        ON r.user_id = g.user_id AND r.rn = g.idx
    ), p AS (
      SELECT user_id, b, COUNT(*) AS n,
             CAST(SUM(di) AS BIGINT) AS sx,
             CAST(SUM(cents) AS BIGINT) AS sy,
             CAST(SUM(di * cents) AS BIGINT) AS sxy,
             CAST(SUM(di * di) AS BIGINT) AS sxx
      FROM samp GROUP BY 1, 2
    )
    SELECT user_id, b,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE), 6)
             AS vel_cents_per_day
    FROM p
    """,
)
def velocity_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(series, replicate) bootstrap velocity: deterministic
    with-replacement resampling (idx = md5-hash(key:b:i) % n + 1) joined
    back by row number, closed-form slope over integer partials. The
    caller's std over b is the reference's bootstrap sigma; emitting the
    replicates keeps the driver comparison exact instead of trusting a
    cross-engine STDDEV fold."""
    from mintpy_spark.functions.scalars import portable_hash60

    ev = load(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    obs = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    wk = Window.partitionBy("user_id")
    ed = F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
    numbered = obs.select(
        "user_id",
        "cents",
        (ed - F.min(ed).over(wk)).alias("di"),
        F.row_number().over(wk.orderBy("ts", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wk).alias("n"),
    )
    keys = numbered.select("user_id", "n").distinct()
    grid = (
        keys.withColumn("b", F.explode(F.sequence(F.lit(1), F.lit(_B))))
        .withColumn("i", F.explode(F.sequence(F.lit(1), F.col("n"))))
        .withColumn(
            "idx",
            F.pmod(
                portable_hash60(
                    F.concat_ws(
                        ":",
                        F.col("user_id").cast("string"),
                        F.col("b").cast("string"),
                        F.col("i").cast("string"),
                    )
                ),
                F.col("n"),
            )
            + 1,
        )
    )
    samp = grid.join(
        numbered.select("user_id", "rn", "di", "cents"),
        (grid.user_id == numbered.user_id) & (grid.idx == numbered.rn),
    ).select(grid.user_id, "b", "di", "cents")
    p = samp.groupBy("user_id", "b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("di").alias("sx"),
        F.sum("cents").alias("sy"),
        F.sum(F.col("di") * F.col("cents")).alias("sxy"),
        F.sum(F.col("di") * F.col("di")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0)
    )
    return p.select(
        "user_id",
        "b",
        F.round(num.cast("double") / den.cast("double"), 6).alias(
            "vel_cents_per_day"
        ),
    )


@_q(
    "velocity_rolling_30d",
    """
    WITH d AS (
      SELECT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS di,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
      GROUP BY 1, 2
    ), w AS (
      SELECT user_id, di,
             COUNT(*) OVER win AS n,
             CAST(SUM(di) OVER win AS BIGINT) AS sx,
             CAST(SUM(cents) OVER win AS BIGINT) AS sy,
             CAST(SUM(di * cents) OVER win AS BIGINT) AS sxy,
             CAST(SUM(di * di) OVER win AS BIGINT) AS sxx
      FROM d
      WINDOW win AS (PARTITION BY user_id ORDER BY di
                     RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, di, n AS n_days,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE), 6)
             AS slope_cents_per_day
    FROM w
    """,
)
def velocity_rolling_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day LS slope of the daily cents series per key: an
    integer RANGE frame over the day index (gaps handled by RANGE, not
    ROWS), exact int64 window partials, one double division per row."""
    ev = load(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    d = ev.groupBy(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("di"),
    ).agg(
        F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).alias(
            "cents"
        )
    )
    win = (
        Window.partitionBy("user_id").orderBy("di").rangeBetween(-29, 0)
    )
    w = d.select(
        "user_id",
        "di",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("di").over(win).alias("sx"),
        F.sum("cents").over(win).alias("sy"),
        F.sum(F.col("di") * F.col("cents")).over(win).alias("sxy"),
        F.sum(F.col("di") * F.col("di")).over(win).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0)
    )
    return w.select(
        "user_id",
        "di",
        F.col("n").alias("n_days"),
        F.round(num.cast("double") / den.cast("double"), 6).alias(
            "slope_cents_per_day"
        ),
    )
