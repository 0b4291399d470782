"""Round-3 additions, batch j: keyless interval-containment join
(bucket-snapped range join, the asc_desc2horz_vert grid technique in the
time domain) and deterministic per-source quota sampling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.operators.sessionize import sessionize, sessionize_oracle_sql
from mintpy_spark.queries import _q, load

_IVJ_GAP = "6 hours"
_IVJ_GAP_S = 6 * 3600


@_q(
    "interval_join_session_errors",
    f"""
    WITH s AS ({sessionize_oracle_sql(
        table="(SELECT * FROM events WHERE user_id < 5) sub",
        gap_seconds=_IVJ_GAP_S,
    )})
    SELECT s.user_id, s.session_start, s.session_end,
           CAST(COUNT(p.event_id) AS BIGINT) AS n_errors
    FROM s LEFT JOIN events p
      ON p.event_type = 'error'
     AND p.ts >= s.session_start AND p.ts <= s.session_end
    GROUP BY s.user_id, s.session_start, s.session_end
    """,
)
def interval_join_session_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless interval-containment join: for each tracked user's
    session window, count ERROR events from the WHOLE event stream
    (any user) inside the window — the "correlate my sessions with
    global incidents" query. No shared key between sides, so the naive
    plan is a cartesian BroadcastNestedLoopJoin; the engine snaps both
    sides to hour buckets and hash-joins on the bucket
    (operators/intervaljoin.bucketed_interval_join), exactly the
    reference's overlap-grid equi-join recast
    (asc_desc2horz_vert.py:15)."""
    from mintpy_spark.operators.intervaljoin import interval_point_counts

    ev = load(spark, sf_dir, "events")
    sessions = sessionize(ev.where(F.col("user_id") < 5), gap=_IVJ_GAP)
    errors = ev.where(F.col("event_type") == "error").select("ts", "event_id")
    counts = interval_point_counts(
        sessions.select("user_id", "session_start", "session_end"),
        errors,
        bucket_seconds=3600,
        keys=("user_id",),
    )
    return counts.select(
        "user_id", "session_start", "session_end",
        F.col("n_inside").alias("n_errors"),
    )


@_q(
    "sample_source_quota",
    """
    WITH h AS (
      SELECT source, doc_id,
             ('0x' || substring(md5(doc_id::VARCHAR || ':quota'), 1, 15))
               ::BIGINT AS _h
      FROM documents),
    r AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY _h, doc_id)
               AS rk
      FROM h)
    SELECT source, doc_id, CAST(rk AS INT) AS rk
    FROM r WHERE rk <= 10
    """,
)
def sample_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source quota sample (at most 10 docs per
    source, hash-ranked): the source-mixing cap of a corpus recipe.
    Membership is stable under re-runs/re-partitioning and independent
    of the stratified split's salt
    (operators/sampling.quota_sample)."""
    from mintpy_spark.operators.sampling import quota_sample

    docs = load(spark, sf_dir, "documents")
    return quota_sample(docs, key="source", id_col="doc_id", k=10)
