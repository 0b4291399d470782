"""Round-3 batch qq: two integral drift scores and a trend test.

* ``psi_drift_weekly`` — Population Stability Index between consecutive
  weeks' value histograms (the model-monitoring standard): add-one
  smoothed p*ln(p/q), summed over the FULL fixed bin grid (empty bins
  contribute, unlike TVD/KS — operators/drift.dense_week_bins).
* ``wasserstein_drift_weekly`` — 1-D earth-mover distance between the
  same histograms: sum of |CDF gaps| x bin width; localized AND
  magnitude-aware where KS is max-only and TVD ignores bin order.
  Integer cross-products until one final division.
* ``mann_kendall_daily`` — the classic nonparametric trend test on the
  daily revenue-cents series per event_type: exact-integer S statistic
  with the tie-corrected variance (18*Var kept as an exact BIGINT) and
  the continuity-corrected normal z. The pairwise i<j join runs on the
  per-day AGGREGATE (days-per-retention rows), never raw events — the
  same "pairwise on the reduced table" shape as MintPy's ifgram network
  built over epochs, not pixels (reference: src/mintpy/objects/
  stack.py:1292-1352 sequential pair network).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

_NBINS = 10

# Shared DuckDB scaffolding: consecutive-week dense bin grid (the SQL
# twin of operators/drift.dense_week_bins over floor(value/50) clamp 0..9).
_DENSE_SQL = f"""
    base AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk,
             least(greatest(CAST(floor(value / 50) AS BIGINT), 0), 9) AS bin,
             COUNT(*) AS c
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2, 3
    ), contrib AS (
      SELECT event_type, wk AS pw, bin, c AS cur, 0 AS prev FROM base
      UNION ALL
      SELECT event_type, wk + 1, bin, 0, c FROM base
    ), g AS (
      SELECT event_type, pw, bin, SUM(cur) AS cur, SUM(prev) AS prev
      FROM contrib GROUP BY 1, 2, 3
    ), tot AS (
      SELECT event_type, pw, SUM(cur) AS tc, SUM(prev) AS tp
      FROM g GROUP BY 1, 2
    ), grid AS (
      SELECT t.event_type, t.pw, b.bin, t.tc, t.tp
      FROM tot t
      CROSS JOIN (SELECT CAST(range AS BIGINT) AS bin FROM range({_NBINS})) b
      WHERE t.tc > 0 AND t.tp > 0
    ), dense AS (
      SELECT grid.event_type, grid.pw, grid.bin, grid.tc, grid.tp,
             COALESCE(g.cur, 0) AS cur, COALESCE(g.prev, 0) AS prev
      FROM grid LEFT JOIN g
        ON grid.event_type = g.event_type AND grid.pw = g.pw
       AND grid.bin = g.bin
    )
"""


def _dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mintpy_spark.operators.drift import dense_week_bins

    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    return dense_week_bins(
        ev,
        F.least(
            F.greatest(F.floor(F.col("value") / 50).cast("long"), F.lit(0)),
            F.lit(9),
        ),
        _NBINS,
    )


@_q(
    "psi_drift_weekly",
    f"""
    WITH {_DENSE_SQL}
    SELECT event_type, CAST(pw AS BIGINT) AS wk,
           CAST(MAX(tp) AS BIGINT) AS n_prev,
           CAST(MAX(tc) AS BIGINT) AS n_cur,
           ROUND(SUM(
             ((cur + 1.0) / (tc + {_NBINS}.0) - (prev + 1.0) / (tp + {_NBINS}.0))
             * ln(((cur + 1.0) / (tc + {_NBINS}.0))
                  / ((prev + 1.0) / (tp + {_NBINS}.0)))
           ), 4) AS psi
    FROM dense GROUP BY 1, 2
    """,
)
def psi_drift_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI per event_type between consecutive weeks, add-one smoothed
    over the full 10-bin grid (a bin present last week but empty this
    week still moves the score — the dense grid makes that term exist).
    Plan: one histogram agg + the x2 contribution fan-out + a 10-row
    broadcast grid join, all on aggregates; the ln runs over ~10 rows
    per (type, week) pair. Convention: psi < 0.1 stable, > 0.25 action."""
    d = _dense(spark, sf_dir)
    nb = float(_NBINS)
    pc = (F.col("cur") + 1.0) / (F.col("tc") + nb)
    pp = (F.col("prev") + 1.0) / (F.col("tp") + nb)
    return d.groupBy("event_type", F.col("pw").alias("wk")).agg(
        F.max("tp").cast("long").alias("n_prev"),
        F.max("tc").cast("long").alias("n_cur"),
        F.round(F.sum((pc - pp) * F.log(pc / pp)), 4).alias("psi"),
    )


@_q(
    "wasserstein_drift_weekly",
    f"""
    WITH {_DENSE_SQL}, cdf AS (
      SELECT event_type, pw, bin, tc, tp,
             SUM(cur) OVER (PARTITION BY event_type, pw ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cumc,
             SUM(prev) OVER (PARTITION BY event_type, pw ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS cump
      FROM dense
    )
    SELECT event_type, CAST(pw AS BIGINT) AS wk,
           CAST(MAX(tp) AS BIGINT) AS n_prev,
           CAST(MAX(tc) AS BIGINT) AS n_cur,
           ROUND(SUM(ABS(cumc * tp - cump * tc)) * 50.0
                 / (MAX(tc) * MAX(tp)), 4) AS w1
    FROM cdf GROUP BY 1, 2
    """,
)
def wasserstein_drift_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 (earth-mover) drift per event_type between
    consecutive weeks, in VALUE units (bin width 50): integral of the
    |CDF gap| over the dense grid. The cumulative window must run over
    ALL 10 bins — a gap persists across bins empty in both weeks, which
    is why this shares dense_week_bins with PSI instead of KS's
    occupied-bin scaffolding. Cross-products cumc*tp - cump*tc stay
    exact BIGINTs; one double division at the end."""
    d = _dense(spark, sf_dir)
    wcum = (
        Window.partitionBy("event_type", "pw")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.select(
        "event_type", "pw", "tc", "tp",
        F.sum("cur").over(wcum).alias("cumc"),
        F.sum("prev").over(wcum).alias("cump"),
    )
    return c.groupBy("event_type", F.col("pw").alias("wk")).agg(
        F.max("tp").cast("long").alias("n_prev"),
        F.max("tc").cast("long").alias("n_cur"),
        F.round(
            F.sum(F.abs(F.col("cumc") * F.col("tp") - F.col("cump") * F.col("tc")))
            * 50.0
            / (F.max("tc") * F.max("tp")),
            4,
        ).alias("w1"),
    )


@_q(
    "mann_kendall_daily",
    """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ), s AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                           WHEN b.cents < a.cents THEN -1 ELSE 0 END)
                  AS BIGINT) AS s_stat
      FROM d a JOIN d b ON a.event_type = b.event_type AND a.day < b.day
      GROUP BY 1
    ), n AS (
      SELECT event_type, COUNT(*) AS n_days FROM d GROUP BY 1
    ), ties AS (
      SELECT event_type,
             CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie18
      FROM (SELECT event_type, cents, COUNT(*) AS t FROM d GROUP BY 1, 2)
      GROUP BY 1
    )
    SELECT s.event_type, CAST(n.n_days AS BIGINT) AS n_days, s.s_stat,
           CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - ties.tie18
                AS BIGINT) AS var18,
           ROUND(CASE
             WHEN n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) = ties.tie18
               THEN NULL
             WHEN s.s_stat > 0 THEN (s.s_stat - 1)
               / sqrt((n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                       - ties.tie18) / 18.0)
             WHEN s.s_stat < 0 THEN (s.s_stat + 1)
               / sqrt((n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                       - ties.tie18) / 18.0)
             ELSE 0.0 END, 4) AS z
    FROM s JOIN n ON s.event_type = n.event_type
    JOIN ties ON s.event_type = ties.event_type
    WHERE n.n_days >= 2
    """,
)
def mann_kendall_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per event_type on the daily revenue-cents
    series: S = sum of sign(x_j - x_i) over i<j (exact integer — cents,
    not doubles, so ties are well-defined), tie-corrected variance kept
    as var18 = 18*Var (exact BIGINT), continuity-corrected z. The O(n^2)
    pair join runs on the per-day aggregate (retention-bounded rows per
    type), which is the scale-safe place for it; all-tied or single-day
    series yield z NULL/filtered. One raw-data pass, everything after is
    driver-sized."""
    from mintpy_spark.plans.cache import persist_slot

    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    d = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("cents")
    )
    d = persist_slot(d, _MK_SLOT)
    a = d.select("event_type", F.col("day").alias("di"), F.col("cents").alias("xi"))
    b = d.select("event_type", F.col("day").alias("dj"), F.col("cents").alias("xj"))
    sgn = (
        F.when(F.col("xj") > F.col("xi"), 1)
        .when(F.col("xj") < F.col("xi"), -1)
        .otherwise(0)
    )
    s = (
        a.join(b, ["event_type"])
        .where(F.col("di") < F.col("dj"))
        .groupBy("event_type")
        .agg(F.sum(sgn).cast("long").alias("s_stat"))
    )
    n = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    ties = (
        d.groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie18")
        )
    )
    j = s.join(n, "event_type").join(ties, "event_type").where(F.col("n_days") >= 2)
    var18 = (
        F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.col("tie18")
    )
    denom = F.sqrt(var18 / 18.0)
    z = (
        F.when(var18 == 0, F.lit(None).cast("double"))
        .when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / denom)
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / denom)
        .otherwise(F.lit(0.0))
    )
    return j.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        "s_stat",
        var18.cast("long").alias("var18"),
        F.round(z, 4).alias("z"),
    )


_MK_SLOT: list = []
