"""Round-3 batch an: sequence-pattern census — MATCH_RECOGNIZE-lite over
per-day event sequences (the complex-event-processing counterpart of the
fixed funnel: an arbitrary regex over the ordered event-type string).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

_PATTERN = "c.*p"  # a click followed (eventually) by a purchase


@_q(
    "event_pattern_census",
    f"""
    WITH seqs AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS seq
      FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           COUNT(*) AS days_active,
           CAST(SUM(CASE WHEN regexp_matches(seq, '{_PATTERN}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS days_matched,
           ROUND(CAST(SUM(CASE WHEN regexp_matches(seq, '{_PATTERN}')
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4)
             AS match_share
    FROM seqs GROUP BY user_id
    """,
)
def event_pattern_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key census of days whose ordered event-type sequence matches a
    regex (click ... purchase): each day's sequence string is built
    ROW-GROUP-LOCALLY from a sorted struct array (collect_list ->
    array_sort on (ts, event_id) -> concat), bounded by the day's own
    event volume — the same state bound as sessionization; the per-key
    census is a map-combined re-aggregation. Regex semantics are
    partial-match on both engines (rlike / regexp_matches)."""
    ev = load(spark, sf_dir, "events")
    seqs = (
        ev.groupBy(
            "user_id", F.date_trunc("day", "ts").alias("day")
        )
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("ts").alias("t"),
                                F.col("event_id").alias("i"),
                                F.substring("event_type", 1, 1).alias("ch"),
                            )
                        )
                    ),
                    lambda s: s["ch"],
                ),
            ).alias("seq")
        )
    )
    hit = F.when(F.col("seq").rlike(_PATTERN), F.lit(1)).otherwise(F.lit(0))
    out = seqs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("days_active"),
        F.sum(hit).cast("long").alias("days_matched"),
    )
    return out.select(
        "user_id",
        "days_active",
        "days_matched",
        F.round(
            F.col("days_matched").cast("double") / F.col("days_active"), 4
        ).alias("match_share"),
    )
