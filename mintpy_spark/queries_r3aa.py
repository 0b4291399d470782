"""Round-3 additions, batch aa: the relational reshaping shapes —
PIVOT, UNPIVOT (melt), and the rank transform.

* pivot — per-day wide counts, one column per event_type from a FIXED
  domain list (a pivot over a discovered domain is non-deterministic by
  construction; both engines get the same literal list).
* unpivot — lineitem's three measures melted to long form via stack(),
  per-returnflag stats per measure (the tidy-data melt every feature
  pipeline runs before per-measure normalization).
* rank transform — per-day percent_rank of event value in basis points:
  rank statistics are the tie-safe normalization (equal values share a
  rank, so the output is deterministic at any partitioning — no
  tiebreak column needed, unlike row_number).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@_q(
    "pivot_daily_type_counts",
    f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
           {", ".join(
               f"CAST(COUNT(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}"
               for t in EVENT_TYPES
           )},
           CAST(COUNT(*) FILTER (event_type NOT IN
                ({", ".join(repr(t) for t in EVENT_TYPES)})) AS BIGINT)
             AS n_other,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM events GROUP BY 1
    """,
)
def pivot_daily_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-day event-type counts — the PIVOT shape, over the FIXED
    type domain (plus an n_other catch-all so an unexpected type can
    never silently vanish).  Implemented as conditional aggregates
    rather than df.pivot(): the fixed column set keeps the schema
    STATIC, which a pivot over a discovered domain cannot guarantee
    (and a schema that depends on the data is a breaking change waiting
    to happen downstream).  Plan: one scan, one day-keyed hash agg with
    map-side combine — pivot width is free."""
    ev = load(spark, sf_dir, "events")
    aggs = [
        F.sum((F.col("event_type") == t).cast("long")).alias(f"n_{t}")
        for t in EVENT_TYPES
    ]
    return ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("bucket_start")
    ).agg(
        *aggs,
        F.sum(
            (~F.col("event_type").isin(*EVENT_TYPES)).cast("long")
        ).alias("n_other"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
    )


@_q(
    "unpivot_lineitem_measures",
    """
    WITH long AS (
      SELECT l_returnflag, 'quantity' AS measure, l_quantity AS v
      FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'discount', l_discount FROM lineitem
    )
    SELECT l_returnflag, measure,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(v) AS vmin,
           MAX(v) AS vmax,
           ROUND(SUM(v), 2) AS vsum
    FROM long GROUP BY 1, 2
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt lineitem's three measures to long form (UNPIVOT via
    stack()) and aggregate per (returnflag, measure) — the tidy-data
    reshape before any per-measure normalization.  stack() is row-local
    (no shuffle for the reshape itself); one hash agg follows.  The 3x
    row fan-out never materializes: the melt feeds straight into the
    map-side combine."""
    li = load(spark, sf_dir, "lineitem")
    long = li.select(
        "l_returnflag",
        F.expr(
            "stack(3, 'quantity', l_quantity, "
            "'extendedprice', l_extendedprice, "
            "'discount', l_discount) AS (measure, v)"
        ),
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.round(F.sum("v"), 2).alias("vsum"),
    )


@_q(
    "value_percentile_daily",
    """
    SELECT event_id,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
           value,
           CAST(floor(percent_rank() OVER (
                  PARTITION BY date_trunc('day', ts) ORDER BY value
                ) * 10000 + 0.5) AS BIGINT) AS pr_bp
    FROM events WHERE value IS NOT NULL
    """,
)
def value_percentile_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day rank transform of event values in basis points — the
    distribution-free normalization (quantile scaling) feature pipelines
    apply before mixing heterogeneous scales.  percent_rank is TIE-SAFE:
    equal values share a rank, so the output is deterministic at any
    partitioning without a tiebreak column (row_number would not be).
    Plan: one Exchange on the day key, partition-local sort, zero joins."""
    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    day = F.date_trunc("day", F.col("ts"))
    w = Window.partitionBy(day).orderBy("value")
    return ev.select(
        "event_id",
        day.alias("bucket_start"),
        "value",
        F.floor(F.percent_rank().over(w) * 10000 + 0.5)
        .cast("long")
        .alias("pr_bp"),
    )
