"""Round-3 additions, batch d: per-observation anomaly monitoring and
cross-metric correlation — both in the exact-integer-partials discipline
(the float ops on both engines consume identical int64 inputs through an
identical op sequence, so even the DECISION BOUNDARY of the anomaly flag
is reproducible bit-for-bit; see operators/anomaly.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load


@_q(
    "anomaly_rolling_z",
    """
    WITH q AS (
      SELECT user_id, ts, value,
             CASE WHEN isnan(value) THEN NULL
                  ELSE CAST(floor(value * 100.0 + 0.5) AS BIGINT) END AS v
      FROM events
    ), w AS (
      SELECT user_id, ts, value, v,
             CAST(COUNT(v) OVER fr AS BIGINT) AS n,
             CAST(SUM(v) OVER fr AS BIGINT) AS s1,
             -- squared terms in HUGEINT (the Spark plan uses
             -- DECIMAL(38,0)): v*v overflows int64 at |v| ~ 3e9
             SUM(CAST(v AS HUGEINT) * v) OVER fr AS s2
      FROM q
      WINDOW fr AS (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, ts, value, n,
           v * n - s1 AS dev,
           ROUND(CAST(v * n - s1 AS DOUBLE)
                 / sqrt(CAST(n AS DOUBLE)
                        * CAST(n * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
                        / CAST(n - 1 AS DOUBLE)), 4) AS z
    FROM w
    WHERE n >= 8
      AND n * s2 - CAST(s1 AS HUGEINT) * s1 > 0
      AND CAST(v * n - s1 AS HUGEINT) * (v * n - s1) * (n - 1)
          > 9 * n * (n * s2 - CAST(s1 AS HUGEINT) * s1)
    """,
)
def anomaly_rolling_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 3-sigma z-score monitor over each user's value series (the
    per-observation counterpart of timeseries_rms.py's MAD epoch
    exclusion): flag points deviating > 3 sample stddevs from the trailing
    12-observation window. The flag predicate is exact int64 both sides —
    see operators/anomaly.py for the algebra."""
    from mintpy_spark.operators.anomaly import rolling_zscore_anomalies

    ev = load(spark, sf_dir, "events")
    return rolling_zscore_anomalies(
        ev, "value", key="user_id", ts="ts", lookback=12, min_obs=8, threshold=3
    )


@_q(
    "corr_len_tokens",
    """
    WITH m AS (
      SELECT source,
             length(text) AS x,
             len(list_filter(string_split(text, ' '), t -> t <> '')) AS y
      FROM documents
      WHERE text IS NOT NULL
    ), a AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM m GROUP BY source
    )
    SELECT source, n,
           n * sxy - sx * sy AS corr_num,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 4) AS corr
    FROM a
    WHERE n >= 3 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def corr_len_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Pearson correlation between document char length and
    whitespace token count, from exact integer partials (dem_error.py's
    metric-vs-metric diagnostic recast per group). One hash aggregation,
    decomposable partials, zero Python."""
    from mintpy_spark.operators.anomaly import exact_group_corr

    d = load(spark, sf_dir, "documents")
    x = F.length("text").cast("long")
    y = F.size(F.filter(F.split("text", " "), lambda t: t != "")).cast("long")
    return exact_group_corr(d, x, y, group="source", min_n=3)
