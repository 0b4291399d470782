"""Round-4 batch h: Holt-Winters additive triple smoothing under the
driver oracle — the recursive-CTE twin of the Kalman filter
(queries_r4e.py), carrying the rotating 7-slot weekly seasonal profile
as explicit recursion state. Inputs are daily integer-cent sums so the
pre-aggregation is order-independent; the recursion itself is written in
the identical operation order on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

_A, _B, _G, _P = 0.3, 0.1, 0.2, 7

_S_OLD = (
    "(CASE (s.rn - 1) % 7"
    " WHEN 0 THEN rec.s0 WHEN 1 THEN rec.s1 WHEN 2 THEN rec.s2"
    " WHEN 3 THEN rec.s3 WHEN 4 THEN rec.s4 WHEN 5 THEN rec.s5"
    " ELSE rec.s6 END)"
)
_L_NEW = f"({_A} * (s.y - {_S_OLD}) + (1 - {_A}) * (rec.l + rec.b))"
_B_NEW = f"({_B} * ({_L_NEW} - rec.l) + (1 - {_B}) * rec.b)"
_S_NEW = f"({_G} * (s.y - {_L_NEW}) + (1 - {_G}) * {_S_OLD})"
_SLOTS = ", ".join(
    f"CASE WHEN (s.rn - 1) % 7 = {j} THEN {_S_NEW} ELSE rec.s{j} END AS s{j}"
    for j in range(_P)
)


@_q(
    "holt_winters_weekly",
    f"""
    WITH RECURSIVE daily AS (
      SELECT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS DOUBLE) AS y
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ), s AS (
      SELECT user_id,
             row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn,
             y
      FROM daily
    ), rec AS (
      SELECT user_id, rn, y, y AS l, CAST(0 AS DOUBLE) AS b,
             CAST(0 AS DOUBLE) AS s0, CAST(0 AS DOUBLE) AS s1,
             CAST(0 AS DOUBLE) AS s2, CAST(0 AS DOUBLE) AS s3,
             CAST(0 AS DOUBLE) AS s4, CAST(0 AS DOUBLE) AS s5,
             CAST(0 AS DOUBLE) AS s6
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.rn, s.y,
             {_L_NEW} AS l,
             {_B_NEW} AS b,
             {_SLOTS}
      FROM rec JOIN s ON s.user_id = rec.user_id AND s.rn = rec.rn + 1
    )
    SELECT user_id, rn,
           CAST(FLOOR(l * 10000) AS BIGINT) AS level_e4,
           CAST(FLOOR(b * 10000) AS BIGINT) AS trend_e4,
           CAST(FLOOR(CASE WHEN rn = 1 THEN 0
                WHEN (rn - 1) % 7 = 0 THEN s0 WHEN (rn - 1) % 7 = 1 THEN s1
                WHEN (rn - 1) % 7 = 2 THEN s2 WHEN (rn - 1) % 7 = 3 THEN s3
                WHEN (rn - 1) % 7 = 4 THEN s4 WHEN (rn - 1) % 7 = 5 THEN s5
                ELSE s6 END * 10000) AS BIGINT) AS seasonal_e4
    FROM rec
    """,
)
def holt_winters_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Causal Holt-Winters (alpha=0.3, beta=0.1, gamma=0.2, period 7)
    over each key's daily cent-sum series: filtered level, trend, and
    the seasonal slot written at each step, floor-quantized to 1e-4.
    The oracle replays the recursion with a RECURSIVE CTE whose state
    row carries the seven seasonal slots explicitly — bit-identical
    doubles before quantization.

    Reference analog: timeseries2velocity's periodic model terms
    (time_func.py annual/semi-annual design columns), recast as the
    online triple-smoothing pass a streaming tier loop would run.

    Scale: daily pre-aggregation is one map-side-combining shuffle; the
    smoothing pass is the same per-key Arrow seam as the Kalman filter
    with P + 2 doubles of state per key.
    """
    from mintpy_spark.operators.holtwinters import holt_winters_additive

    ev = load(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "user_id", F.date_trunc("day", "ts").alias("bucket_start")
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("double")
            .alias("y")
        )
    )
    out = holt_winters_additive(
        daily, "y", key="user_id", ts="bucket_start",
        period=_P, alpha=_A, beta=_B, gamma=_G,
    )
    return out.select(
        "user_id",
        "rn",
        F.floor(F.col("level") * 10000).cast("long").alias("level_e4"),
        F.floor(F.col("trend") * 10000).cast("long").alias("trend_e4"),
        F.floor(F.col("seasonal") * 10000).cast("long").alias("seasonal_e4"),
    )
