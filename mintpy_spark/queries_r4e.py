"""Round-4 batch e: causal Kalman local-level filtering under the driver
oracle — DuckDB replays the identical scalar recursion with a recursive
CTE, so the engine's applyInPandas forward pass is certified bit-for-bit
(floor-quantized at the boundary per the engine discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

_Q, _R = 0.04, 1.0


@_q(
    "kalman_level_filter",
    f"""
    WITH RECURSIVE s AS (
      SELECT user_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, value)
               AS rn,
             CAST(value AS DOUBLE) AS y
      FROM events WHERE value IS NOT NULL
    ), rec AS (
      SELECT user_id, rn, y, y AS m, CAST({_R} AS DOUBLE) AS p
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.rn, s.y,
             rec.m + ((rec.p + {_Q}) / (rec.p + {_Q} + {_R}))
                   * (s.y - rec.m),
             (1 - (rec.p + {_Q}) / (rec.p + {_Q} + {_R}))
               * (rec.p + {_Q})
      FROM rec JOIN s ON s.user_id = rec.user_id AND s.rn = rec.rn + 1
    )
    SELECT user_id, rn,
           CAST(FLOOR(m * 10000) AS BIGINT) AS level_e4
    FROM rec
    """,
)
def kalman_level_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Causal Kalman local-level filter over every key's series (q=0.04,
    r=1.0, first-observation init with prior variance r). The oracle is
    a DuckDB RECURSIVE CTE evaluating the same four-line recursion in
    the same operation order, so filtered levels agree to the last bit
    before the floor quantization.

    Reference analog: the temporal-filter family (operators/filters.py
    mirrors tsview's moving windows); the Kalman form is the online
    variant a streaming rollup loop applies as observations arrive —
    O(1) state per key, no look-ahead.

    Scale: one shuffle into the per-key Arrow seam; state is two doubles
    per key, which is exactly what the streaming twin would keep in the
    state store at 10^9 keys.
    """
    from mintpy_spark.operators.kalman import kalman_level

    ev = load(spark, sf_dir, "events")
    out = kalman_level(ev, "value", key="user_id", ts="ts", q=_Q, r=_R)
    return out.select(
        "user_id",
        "rn",
        F.floor(F.col("level") * F.lit(10000)).cast("long").alias("level_e4"),
    )
