"""Gap-based sessionization.

A web-analytics staple the reference has no analog for (closest: the
pair-network's temporal-connectivity grouping, stack.py:1113 sequential
loops): events of one key belong to one session while inter-arrival gaps
stay below a threshold.

Two equivalent implementations:

* ``sessionize`` — Spark's native ``session_window`` aggregation (state
  merges adjacent windows; also works under Structured Streaming with a
  watermark, which is why it's the default).
* the lag/cumsum window form used by the DuckDB oracle (boundary flag =
  gap > threshold; session id = running sum of flags) — the portable
  formulation.

Both produce identical session boundaries: a session extends while the
next event arrives within ``gap`` of the previous one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value_col: str = "value",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-(key, session): start/end/duration/count/sum via the native
    session_window aggregation — one shuffle on (key, merged window)."""
    return (
        df.groupBy(key, F.session_window(F.col(ts), gap).alias("w"))
        .agg(
            F.count(value_col).alias("n_events"),
            F.sum(value_col).alias("vsum"),
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
        )
        .select(
            key,
            "session_start",
            "session_end",
            (
                F.unix_micros(F.col("session_end").cast("timestamp"))
                - F.unix_micros(F.col("session_start").cast("timestamp"))
            ).alias("duration_us"),
            "n_events",
            "vsum",
        )
    )


def sessionize_oracle_sql(
    table: str = "events", key: str = "user_id", ts: str = "ts",
    value_col: str = "value", gap_seconds: int = 1800,
) -> str:
    """Portable lag/cumsum formulation producing identical sessions."""
    return f"""
    WITH flagged AS (
      SELECT {key}, {ts}, {value_col},
             CASE WHEN {ts} - lag({ts}) OVER w < INTERVAL {gap_seconds} SECOND
                  THEN 0 ELSE 1 END AS new_session
      FROM {table}
      WINDOW w AS (PARTITION BY {key} ORDER BY {ts})
    ),
    numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY {key} ORDER BY {ts}
                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT {key},
           MIN({ts}) AS session_start,
           MAX({ts}) AS session_end,
           CAST(epoch_us(MAX({ts})) - epoch_us(MIN({ts})) AS BIGINT) AS duration_us,
           COUNT({value_col}) AS n_events,
           SUM({value_col})   AS vsum
    FROM numbered
    GROUP BY {key}, session_id
    """
