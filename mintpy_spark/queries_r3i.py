"""Round-3 additions, batch i: corpus-curation decisions (benchmark
decontamination, Gopher quality-rule filtering) and robust monitoring
tiers (trailing-baseline burst detection, winsorized daily rollup)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.operators import curation as C
from mintpy_spark.queries import _q, load

_DECON_K = 8
_DECON_MOD = 20


@_q(
    "decontaminate_benchmark",
    C.decontaminate_oracle_sql(k=_DECON_K, mod=_DECON_MOD),
)
def decontaminate_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark k-gram decontamination census (GPT-3 appendix-C shape):
    per training document, the count and basis-point fraction of k-token
    windows shared with the held-out benchmark slice, plus the
    contaminated flag. Broadcast join against the fixed-size benchmark
    hash set; one Exchange (operators/curation.decontaminate)."""
    docs = load(spark, sf_dir, "documents")
    return C.decontaminate(docs, k=_DECON_K, mod=_DECON_MOD)


@_q("quality_gopher_flags", C.gopher_flags_oracle_sql())
def quality_gopher_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher/MassiveText quality-rule flags (word-count
    bounds, mean-word-length band, symbol ratio, alphabetic ratio,
    stop-word presence) — integer-exact, zero-shuffle, whole-stage
    codegen (operators/curation.gopher_flags)."""
    docs = load(spark, sf_dir, "documents")
    return C.gopher_flags(docs)


@_q("quality_gopher_by_source", C.gopher_by_source_oracle_sql())
def quality_gopher_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gopher pass-rate table — the curation decision of which
    crawl sources survive filtering and which rule rejects them. One scan
    + one hash agg (operators/curation.gopher_pass_by_source)."""
    docs = load(spark, sf_dir, "documents")
    return C.gopher_pass_by_source(docs)


@_q(
    "burst_ratio_daily",
    """
    WITH c AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
             COUNT(*) AS c,
             date_diff('day', DATE '1970-01-01',
                       CAST(date_trunc('day', ts) AS DATE)) AS d
      FROM events GROUP BY 1, 2, 4),
    r AS (
      SELECT event_type, bucket_day, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY d
                          RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
               AS s_prev,
             COUNT(c) OVER (PARTITION BY event_type ORDER BY d
                            RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
               AS m_prev
      FROM c)
    SELECT event_type, bucket_day,
           CAST(c AS BIGINT) AS c,
           CAST(COALESCE(s_prev, 0) AS BIGINT) AS s_prev,
           CAST(COALESCE(m_prev, 0) AS BIGINT) AS m_prev,
           CASE WHEN m_prev > 0
                THEN CAST(floor(c * m_prev * 10000.0 / s_prev + 0.5)
                          AS BIGINT) END AS ratio_bp,
           CAST(CASE WHEN m_prev > 0 AND c * m_prev * 10 >= 13 * s_prev
                     THEN 1 ELSE 0 END AS INT) AS burst
    FROM r
    """,
)
def burst_ratio_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-burst detection per event type: each day's count scored
    against its trailing 7-day baseline with an INTEGER-exact threshold
    decision (c*m*10 >= 13*s, i.e. 1.3x baseline — tight enough to fire
    on organic variation). Two tiny post-partial-agg Exchanges; RANGE
    frame on integer epoch-day so calendar gaps age out
    (operators/anomaly.burst_ratio_daily)."""
    from mintpy_spark.operators.anomaly import burst_ratio_daily as burst

    ev = load(spark, sf_dir, "events")
    return burst(
        ev, key="event_type", ts="ts", lookback_days=7,
        threshold_num=13, threshold_den=10,
    )


@_q(
    "winsorized_daily_mean",
    """
    WITH b AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
             value AS v
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
    q AS (
      SELECT bucket_day,
             quantile_cont(v, 0.05) AS p_lo,
             quantile_cont(v, 0.95) AS p_hi
      FROM b GROUP BY bucket_day)
    SELECT b.bucket_day,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(floor(p_lo * 100.0 + 0.5)) AS BIGINT) AS p_lo_c,
           CAST(MIN(floor(p_hi * 100.0 + 0.5)) AS BIGINT) AS p_hi_c,
           CAST(SUM(floor(least(greatest(v, p_lo), p_hi) * 100.0 + 0.5))
                AS BIGINT) AS wsum_c,
           CAST(SUM(floor(v * 100.0 + 0.5)) AS BIGINT) AS rsum_c
    FROM b JOIN q USING (bucket_day)
    GROUP BY b.bucket_day
    """,
)
def winsorized_daily_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized daily rollup: values clamped into their day's exact
    [p05, p95] percentile band, partials reported as portable fixed-point
    integers. Single Exchange — the day repartition satisfies both the
    percentile window and the final agg
    (operators/robust.winsorized_daily_stats)."""
    from mintpy_spark.operators.robust import winsorized_daily_stats

    ev = load(spark, sf_dir, "events")
    return winsorized_daily_stats(ev)
