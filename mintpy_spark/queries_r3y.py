"""Round-3 additions, batch y: growth accounting, incremental join-view
maintenance, and share-of-day contribution analysis.

* growth accounting — the canonical DAU decomposition (new / retained /
  resurrected / churned) from one distinct pass + one lag/lead window,
  emitting contribution rows so a single day agg yields all four
  columns.  Identities dau = new + retained + resurrected and
  retained(d) = dau(d-1) - churned(d) hold by construction.
* IVM join view — incremental maintenance of an AGGREGATED JOIN view
  (segment revenue): Spark merges base-slice partials with delta-slice
  partials (delta-proportional work — the tier_refresh identity lifted
  to a joined view) while the oracle recomputes the full join from
  scratch; hash equality proves partials-over-join merge losslessly.
  Money in integer cents so no double half-point flips.
* share of day — per (day, event_type) contribution in exact basis
  points via a window sum over the day tier (the percent-of-total
  staple).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.operators.engagement import growth_accounting
from mintpy_spark.queries import _q, load


@_q(
    "growth_accounting_daily",
    """
    WITH ud AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed
      FROM events WHERE user_id IS NOT NULL
    ), t AS (
      SELECT user_id, ed,
             lag(ed) OVER (PARTITION BY user_id ORDER BY ed) AS prev,
             lead(ed) OVER (PARTITION BY user_id ORDER BY ed) AS nxt
      FROM ud
    ), contrib AS (
      SELECT ed AS d,
             CASE WHEN prev IS NULL THEN 1 ELSE 0 END AS new_users,
             CASE WHEN prev = ed - 1 THEN 1 ELSE 0 END AS retained,
             CASE WHEN prev IS NOT NULL AND prev < ed - 1 THEN 1 ELSE 0 END
               AS resurrected,
             0 AS churned
      FROM t
      UNION ALL
      SELECT ed + 1, 0, 0, 0, 1 FROM t
      WHERE nxt IS NULL OR nxt > ed + 1
    )
    SELECT CAST(d AS BIGINT) AS ed,
           CAST(SUM(new_users) AS BIGINT) AS new_users,
           CAST(SUM(retained) AS BIGINT) AS retained,
           CAST(SUM(resurrected) AS BIGINT) AS resurrected,
           CAST(SUM(churned) AS BIGINT) AS churned
    FROM contrib GROUP BY 1
    HAVING SUM(new_users) + SUM(retained) + SUM(resurrected) > 0
    """,
)
def growth_accounting_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New / retained / resurrected / churned users per active day — the
    growth-accounting decomposition every DAU dashboard runs.  Plan: one
    distinct Exchange + one lag/lead window Exchange, then contribution
    rows (<= 2 per user-day) into a single day-keyed hash agg; no second
    window pass, no day-table join."""
    return growth_accounting(load(spark, sf_dir, "events"))


@_q(
    "ivm_segment_revenue_delta",
    """
    SELECT c.c_mktsegment,
           CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1
    """,
)
def ivm_segment_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of an aggregated JOIN view: the Spark side
    splits orders at 1999-01-01 into a base slice and a delta slice,
    aggregates each THROUGH the customer join separately, and merges the
    partials — exactly what a production refresh does with STORED base
    partials and only the delta scanned.  The oracle recomputes the full
    join; hash equality proves cnt/sum partials commute with the join.
    Money in integer cents (floor(x*100 + 0.5)).  Plan: two pruned
    order scans, customer broadcast twice, partial aggs merged by a
    |segments|-bounded final agg — delta-proportional at production
    layout where base partials are a stored table."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("long")
        .alias("_cents"),
    )
    cut = F.lit("1999-01-01").cast("timestamp")

    def part(sl: DataFrame) -> DataFrame:
        return (
            sl.join(F.broadcast(c), sl["o_custkey"] == c["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(
                F.sum("_cents").alias("revenue_cents"),
                F.count(F.lit(1)).alias("n_orders"),
            )
        )

    base = part(o.where(F.col("o_orderdate") < cut))
    delta = part(o.where(F.col("o_orderdate") >= cut))
    return (
        base.unionByName(delta)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("revenue_cents").cast("long").alias("revenue_cents"),
            F.sum("n_orders").cast("long").alias("n_orders"),
        )
    )


@_q(
    "share_of_day_by_type",
    """
    WITH c AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
             event_type, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    )
    SELECT bucket_start, event_type,
           CAST(cnt AS BIGINT) AS cnt,
           CAST(SUM(cnt) OVER (PARTITION BY bucket_start) AS BIGINT)
             AS day_total,
           CAST(floor(cnt * 10000.0
                      / SUM(cnt) OVER (PARTITION BY bucket_start) + 0.5)
                AS BIGINT) AS share_bp
    FROM c
    """,
)
def share_of_day_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total contribution per (day, event_type) in exact
    basis points: one tier agg, then an unordered window sum over the
    |types|-sized day partitions (no sort — a frame-less partition sum).
    Plan: one Exchange for the agg; the window re-uses the day grouping
    with a second small Exchange on the day key."""
    ev = load(spark, sf_dir, "events")
    tier = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("bucket_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("bucket_start")
    total = F.sum("cnt").over(w)
    return tier.select(
        "bucket_start",
        "event_type",
        F.col("cnt").cast("long").alias("cnt"),
        total.cast("long").alias("day_total"),
        F.floor(F.col("cnt") * 10000.0 / total + 0.5)
        .cast("long")
        .alias("share_bp"),
    )
