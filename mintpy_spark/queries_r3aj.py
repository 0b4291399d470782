"""Round-3 batch aj: crawl-operations layer — politeness-delayed fetch
scheduling (closed-form, no recursion) and the Cho/Garcia-Molina page
change-rate estimator that drives revisit cadence.

Same oracle discipline as mintpy_spark.queries: identical aliases and
in-query rounding both sides, exact integer microsecond arithmetic for
everything that crosses the engine boundary unrounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.operators.crawlsched import politeness_oracle_sql
from mintpy_spark.queries import _q, load


@_q(
    "crawl_politeness_schedule",
    politeness_oracle_sql(
        "events", "user_id", "ts", min_delay_s=2, order_cols=("event_id",)
    ),
)
def crawl_politeness_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO fetch schedule per host (user_id as the host analog) under a
    2-second politeness delay. The sequential recurrence
    s_i = max(r_i, s_{i-1} + D) is evaluated as its closed form
    D*i + runningmax(r_j - D*j) — ONE window pass, one Exchange, exact
    int64 microseconds (operators/crawlsched.politeness_schedule)."""
    from mintpy_spark.operators.crawlsched import politeness_schedule

    ev = load(spark, sf_dir, "events")
    return politeness_schedule(
        ev, host="user_id", ts="ts", min_delay_s=2, order_cols=("event_id",)
    )


@_q(
    "crawl_revisit_lambda",
    """
    WITH base AS (
      SELECT user_id, epoch_us(ts) AS us,
             CASE WHEN lag(1) OVER w IS NOT NULL THEN
               CASE WHEN value IS NOT DISTINCT FROM lag(value) OVER w
                    THEN 0 ELSE 1 END
             END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    agg AS (
      SELECT user_id,
             COUNT(chg) AS num_intervals,
             CAST(SUM(chg) AS BIGINT) AS num_changes,
             (MAX(us) - MIN(us)) / 86400000000.0 AS span_days
      FROM base GROUP BY user_id
    )
    SELECT user_id, num_intervals, num_changes,
           ROUND(span_days, 6) AS span_days,
           CASE WHEN num_changes < num_intervals THEN
             ROUND(-LN(1 - CAST(num_changes AS DOUBLE) / num_intervals)
                   / (span_days / num_intervals), 6)
           END AS lambda_per_day
    FROM agg WHERE num_intervals >= 1
    """,
)
def crawl_revisit_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson page-change-rate per key (Cho & Garcia-Molina 2003,
    lambda_hat = -ln(1 - X/m) / I): the revisit-cadence signal an
    incremental crawler feeds back into its frontier. One window pass +
    one hash agg on the same key partitioning
    (operators/crawlsched.change_rate_estimate)."""
    from mintpy_spark.operators.crawlsched import change_rate_estimate

    ev = load(spark, sf_dir, "events")
    out = change_rate_estimate(
        ev, "value", key="user_id", ts="ts", order_cols=("event_id",)
    )
    return out.select(
        "user_id",
        "num_intervals",
        "num_changes",
        F.round("span_days", 6).alias("span_days"),
        F.round("lambda_per_day", 6).alias("lambda_per_day"),
    )
