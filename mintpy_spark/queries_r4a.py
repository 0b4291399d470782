"""Round-4 batch a: oracle coverage for the streaming maintenance path
(tier_realtime_read_check) and the reference's deramp-then-RMS composite
(residual_rms_deramped, src/mintpy/timeseries_rms.py:35-72).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load


@_q(
    "tier_realtime_read_check",
    """
    SELECT user_id,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
           COUNT(value)             AS cnt,
           ROUND(SUM(value), 2) + 0.0 AS vsum,
           MIN(value) AS vmin, MAX(value) AS vmax
    FROM events GROUP BY 1, 2
    """,
)
def tier_realtime_read_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-maintenance path under an oracle: fold the events table
    into stored tier versions in TWO micro-batches via
    TierMaintainer.apply_delta (the foreachBatch body: versioned write +
    atomic commit marker + incremental cascade refresh), leave the last
    third of days UNFOLDED, then answer through read_realtime — committed
    1d partials unioned with an on-the-fly aggregation of the tail,
    merged partial-wise (TimescaleDB materialized_only=false semantics).
    The result must equal a direct batch GROUP BY over ALL events, which
    is exactly the oracle — so the driver hash certifies the whole
    fold-commit-merge loop, not just a batch rollup.

    Reference analog: the update-mode incremental re-inversion
    (ifgram_inversion.py:48-55 partial-write detection + skip-completed)
    composed with the continuous-aggregate read path.

    Scale: identical to the production loop — per-batch cost is delta
    aggregation + touched-cell rewrite; the realtime read adds one
    tail-proportional aggregation. The bounded .collect() pulls only the
    distinct DAY list (calendar-sized) to pick deterministic batch cuts.
    """
    from mintpy_spark.streaming.tier_maintenance import TierMaintainer

    ev = load(spark, sf_dir, "events")
    days = sorted(
        r["d"]
        for r in ev.select(F.date_trunc("day", "ts").alias("d")).distinct().collect()
    )
    cut1 = days[len(days) // 3]
    cut2 = days[(2 * len(days)) // 3]

    store = tempfile.mkdtemp(prefix="tier_rt_check_")
    m = TierMaintainer(store, value_col="value", key="user_id", ts="ts")
    m.apply_delta(ev.where(F.date_trunc("day", "ts") < F.lit(cut1)), batch_id=0)
    m.apply_delta(
        ev.where(
            (F.date_trunc("day", "ts") >= F.lit(cut1))
            & (F.date_trunc("day", "ts") < F.lit(cut2))
        ),
        batch_id=1,
    )
    tail = ev.where(F.date_trunc("day", "ts") >= F.lit(cut2))
    rt = m.read_realtime(spark, "1d", tail)
    # materialize off the store (localCheckpoint), then remove it — the
    # returned DataFrame must not depend on the temp directory
    out = rt.select(
        "user_id",
        "bucket_start",
        "cnt",
        (F.round("vsum", 2) + F.lit(0.0)).alias("vsum"),
        "vmin",
        "vmax",
    ).localCheckpoint(eager=True)
    shutil.rmtree(store, ignore_errors=True)
    return out


@_q(
    "residual_rms_deramped",
    """
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
             ROUND(CAST(value AS DOUBLE)
                   - (vbar + slope * (CAST(user_id AS DOUBLE) - xbar)), 3)
               AS deramped
      FROM (
        SELECT user_id, ts, value,
               AVG(CAST(value AS DOUBLE))   OVER w AS vbar,
               AVG(CAST(user_id AS DOUBLE)) OVER w AS xbar,
               COALESCE(covar_pop(CAST(user_id AS DOUBLE), CAST(value AS DOUBLE)) OVER w
                        / nullif(var_pop(CAST(user_id AS DOUBLE)) OVER w, 0.0),
                        0.0) AS slope
        FROM events
        WINDOW w AS (PARTITION BY CAST(date_trunc('day', ts) AS TIMESTAMP))
      )
    )
    SELECT bucket_start,
           ROUND(SQRT(AVG(deramped * deramped)), 4) AS rms,
           COUNT(*) AS cnt
    FROM d GROUP BY bucket_start
    """,
)
def residual_rms_deramped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's residual-RMS pipeline stage END-TO-END: MintPy's
    timeseries_rms deramps each epoch BEFORE taking its RMS
    (src/mintpy/timeseries_rms.py:35-72 -> utils.utils.run_deramp then
    rms over the residual). The engine composes deramp_epoch (closed-form
    per-day OLS on the key coordinate, pure window aggregates) with a
    per-day RMS aggregation — one shuffle for the window, reused by the
    groupBy on the same day key.

    Exactness: the deramped residual is micro-quantized to the 3-dp grid
    on BOTH sides before squaring (the round-3 discipline that prevents
    last-ulp RMS divergence at the 4-dp boundary)."""
    from mintpy_spark.operators.stats import deramp_epoch

    ev = load(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    der = deramp_epoch(ev, "value", coord_col="user_id", time_col="day")
    q = der.select(
        F.col("day").alias("bucket_start"),
        F.round("deramped", 3).alias("d3"),
    )
    return q.groupBy("bucket_start").agg(
        F.round(F.sqrt(F.avg(F.col("d3") * F.col("d3"))), 4).alias("rms"),
        F.count("*").alias("cnt"),
    )
