"""Round-3 batch am: linear-interpolated as-of alignment — sampling one
irregular series AT another series' timestamps (TimescaleDB
interpolate() / kdb aj-with-fill; the reference's GNSS-onto-SAR-epochs
resampling, insar_vs_gnss.py). Completes the as-of family:
backward/forward/tolerance joins, and now interpolation between the
brackets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load


@_q(
    "asof_interpolate_click",
    """
    WITH u AS (
      SELECT user_id, ts, event_id, 1 AS isp, CAST(NULL AS DOUBLE) AS v,
             epoch_us(ts) AS us
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, event_id, 0 AS isp, CAST(value AS DOUBLE) AS v,
             epoch_us(ts) AS us
      FROM events WHERE event_type = 'click'
    ),
    staged AS (
      SELECT user_id, ts, event_id, isp, us,
             last_value(CASE WHEN isp = 0 THEN {'t': us, 'v': v} END
                        IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, isp, event_id
               ROWS UNBOUNDED PRECEDING) AS prev,
             first_value(CASE WHEN isp = 0 THEN {'t': us, 'v': v} END
                         IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, isp, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
      FROM u
    )
    SELECT user_id, ts, event_id,
           ROUND(CASE
             WHEN prev IS NULL AND nxt IS NULL THEN CAST(NULL AS DOUBLE)
             WHEN prev IS NULL THEN nxt.v
             WHEN nxt IS NULL THEN prev.v
             WHEN nxt.t > prev.t THEN
               prev.v + (nxt.v - prev.v) * ((us - prev.t) / (nxt.t - prev.t))
             ELSE prev.v END, 4) AS v_interp,
           CASE
             WHEN prev IS NULL AND nxt IS NULL THEN 'none'
             WHEN prev IS NULL THEN 'nocb'
             WHEN nxt IS NULL THEN 'locf'
             ELSE 'interp' END AS method
    FROM staged WHERE isp = 1
    """,
)
def asof_interpolate_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The click-value series sampled AT each purchase instant by linear
    interpolation between the bracketing clicks (LOCF/NOCB at the edges)
    — one union-sort-window pass, one Exchange
    (operators/asof.asof_interpolate)."""
    from mintpy_spark.operators.asof import asof_interpolate

    ev = load(spark, sf_dir, "events")
    out = asof_interpolate(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "click"),
        key="user_id", ts="ts", value_col="value",
        order_cols=("event_id",),
    )
    return out.select(
        "user_id", "ts", "event_id",
        F.round("v_interp", 4).alias("v_interp"), "method",
    )
