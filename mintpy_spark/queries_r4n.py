"""Round-4 batch n: Welford's online mean/variance recursion under the
driver oracle — the canonical single-pass moments algorithm (Welford
1962; Knuth TAOCP vol. 2 §4.2.2), certified bit-exact against a DuckDB
RECURSIVE CTE like the Kalman / Holt-Winters passes. This is the exact
algorithm the streaming anomaly path's state store would carry for
exact (non-EWMA) variance, so certifying it end-to-end pins the
engine's online-moments arithmetic, not just the batch STDDEV it must
agree with (the planted test cross-checks both).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

# one step of the recursion, inlined identically on both sides:
#   n'    = n + 1
#   delta = y - mean
#   mean' = mean + delta / n'
#   M2'   = M2 + delta * (y - mean')
_MEAN_NEW = "(rec.mean + (s.y - rec.mean) / CAST(rec.n + 1 AS DOUBLE))"


@_q(
    "welford_online_var",
    f"""
    WITH RECURSIVE s AS (
      SELECT user_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, value)
               AS rn,
             CAST(value AS DOUBLE) AS y
      FROM events WHERE value IS NOT NULL
    ), rec AS (
      SELECT user_id, rn, CAST(1 AS BIGINT) AS n, y AS mean,
             CAST(0 AS DOUBLE) AS m2
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.rn, rec.n + 1,
             {_MEAN_NEW},
             rec.m2 + (s.y - rec.mean) * (s.y - {_MEAN_NEW})
      FROM rec JOIN s ON s.user_id = rec.user_id AND s.rn = rec.rn + 1
    )
    SELECT user_id,
           CAST(arg_max(n, rn) AS BIGINT) AS n,
           CAST(FLOOR(arg_max(mean, rn) * 1000000) AS BIGINT) AS mean_e6,
           CAST(FLOOR(arg_max(m2, rn) * 1000000) AS BIGINT) AS m2_e6,
           CASE WHEN arg_max(n, rn) > 1 THEN
             CAST(FLOOR(arg_max(m2, rn)
                        / CAST(arg_max(n, rn) - 1 AS DOUBLE) * 1000000)
                  AS BIGINT) END AS var_e6
    FROM rec GROUP BY user_id
    """,
)
def welford_online_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key single-pass mean and sample variance via Welford's
    update, run on the sequential-state seam and floor-quantized to
    1e-6. The oracle replays the identical three-line recursion with a
    RECURSIVE CTE — same operation order, so mean and M2 agree to the
    last bit before quantization.

    Reference analog: the epoch/series std statistics
    (operators/stats.py mirrors timeseries_rms) computed ONLINE, the
    form a streaming maintainer keeps as (n, mean, M2) mergeable-free
    per-key state.

    Scale: one shuffle into the shared seqstate seam; three doubles of
    state per key.
    """
    from mintpy_spark.operators.seqstate import map_sorted_groups

    ev = load(spark, sf_dir, "events")
    src = ev.where(F.col("value").isNotNull()).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        F.col("value").cast("double").alias("y"),
    )
    schema = "user_id long, n long, mean double, m2 double"

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in pdf.groupby("user_id", sort=False):
            ys = g["y"].tolist()
            n, mean, m2 = 1, ys[0], 0.0
            for y in ys[1:]:
                n2 = n + 1
                delta = y - mean
                mean_new = mean + delta / float(n2)
                m2 = m2 + delta * (y - mean_new)
                mean = mean_new
                n = n2
            rows.append((uid, n, mean, m2))
        return pd.DataFrame(rows, columns=["user_id", "n", "mean", "m2"])

    out = map_sorted_groups(src, "user_id", ("t", "y"), fold, schema)
    return out.select(
        "user_id",
        "n",
        F.floor(F.col("mean") * 1000000).cast("long").alias("mean_e6"),
        F.floor(F.col("m2") * 1000000).cast("long").alias("m2_e6"),
        F.when(
            F.col("n") > 1,
            F.floor(
                F.col("m2") / (F.col("n") - 1).cast("double") * 1000000
            ).cast("long"),
        ).alias("var_e6"),
    )
