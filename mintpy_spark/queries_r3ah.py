"""Round-3 batch ah: max-min fair crawl-budget allocation.

``crawl_budget_waterfill`` — water-filling a global budget of 50k crawl
slots across per-user (host-analog) event demand: every host funded up
to the common water level, never above demand, leftover units assigned
deterministically. The cross-host fairness layer that complements the
per-url frontier priority (queries_r3ff.crawl_frontier_topk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.operators.budget import waterfill, waterfill_oracle_sql
from mintpy_spark.queries import _q, load

_BUDGET = 50_000


@_q(
    "crawl_budget_waterfill",
    waterfill_oracle_sql(
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS demand"
        " FROM events WHERE user_id IS NOT NULL GROUP BY 1",
        "user_id",
        _BUDGET,
    ),
)
def crawl_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min fair allocation of 50k slots across per-user demand in
    closed form (no iteration): demand census = one shuffle over the
    fact; the water-level solve runs on the |hosts|-row census with the
    three scalars on broadcast 1-row joins. Exact integer output —
    sum(alloc) == min(budget, sum(demand)) by construction."""
    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    demand = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("demand")
    )
    return waterfill(demand, "user_id", "demand", _BUDGET)
