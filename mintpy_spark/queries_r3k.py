"""Round-3 additions, batch k: seasonal-naive forecast skill (MASE),
PMI collocation extraction, and content-defined-chunking dedup."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mintpy_spark.operators import dedup as D
from mintpy_spark.queries import _q, load

_CDC_MOD = 8
_PMI_TOPK = 20
_PMI_MIN = 5


@_q(
    "forecast_snaive_mase",
    """
    WITH c AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
             COUNT(*) AS c,
             date_diff('day', DATE '1970-01-01',
                       CAST(date_trunc('day', ts) AS DATE)) AS d
      FROM events GROUP BY 1, 2, 4),
    r AS (
      SELECT event_type, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY d
                          RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING)
               AS c_s,
             SUM(c) OVER (PARTITION BY event_type ORDER BY d
                          RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING)
               AS c_1
      FROM c),
    a AS (
      SELECT event_type,
             COUNT(c_s)             AS n_scored,
             SUM(abs(c - c_s))      AS err_s,
             COUNT(c_1)             AS n_naive,
             SUM(abs(c - c_1))      AS err_1
      FROM r GROUP BY event_type)
    SELECT event_type,
           CAST(n_scored AS BIGINT)           AS n_scored,
           CAST(COALESCE(err_s, 0) AS BIGINT) AS err_s,
           CAST(n_naive AS BIGINT)            AS n_naive,
           CAST(COALESCE(err_1, 0) AS BIGINT) AS err_1,
           CASE WHEN n_scored > 0 AND n_naive > 0 AND err_1 > 0
                THEN CAST(floor((err_s / n_scored) / (err_1 / n_naive)
                                * 10000.0 + 0.5) AS BIGINT) END AS mase_bp
    FROM a
    """,
)
def forecast_snaive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast skill per event type: MASE (Hyndman &
    Koehler 2006) of forecast(d) = count(d-7) on the 1d count tier,
    scaled by the naive-1 in-sample error — integer-exact error sums,
    exact-offset RANGE frames so calendar gaps yield no-forecast rather
    than silently reading the previous active day
    (operators/forecast.snaive_mase_daily)."""
    from mintpy_spark.operators.forecast import snaive_mase_daily

    ev = load(spark, sf_dir, "events")
    return snaive_mase_daily(ev, key="event_type", ts="ts", season_days=7)


@_q(
    "text_pmi_top_pairs",
    f"""
    WITH w AS (
      SELECT list_filter(string_split(text, ' '), t -> t <> '') AS ws
      FROM documents),
    posn AS (
      SELECT unnest(list_zip(ws[1:len(ws) - 1], ws[2:len(ws)])) AS p
      FROM w WHERE len(ws) >= 2),
    pairs AS (SELECT p[1] AS tok_a, p[2] AS tok_b FROM posn),
    pc AS (
      SELECT tok_a, tok_b, COUNT(*) AS c_ab
      FROM pairs GROUP BY tok_a, tok_b),
    uni AS (
      SELECT tok, SUM(c_ab) AS cu FROM (
        SELECT tok_a AS tok, c_ab FROM pc
        UNION ALL SELECT tok_b AS tok, c_ab FROM pc)
      GROUP BY tok)
    SELECT pc.tok_a, pc.tok_b,
           CAST(pc.c_ab AS BIGINT) AS c_ab,
           CAST(ua.cu AS BIGINT)   AS c_a,
           CAST(ub.cu AS BIGINT)   AS c_b,
           CAST((pc.c_ab * 1000000000000) // (ua.cu * ub.cu) AS BIGINT)
             AS score
    FROM pc
    JOIN uni ua ON ua.tok = pc.tok_a
    JOIN uni ub ON ub.tok = pc.tok_b
    WHERE pc.c_ab >= {_PMI_MIN}
    ORDER BY score DESC, pc.tok_a, pc.tok_b
    LIMIT {_PMI_TOPK}
    """,
)
def text_pmi_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: top-20 adjacent-token bigrams by PMI with
    an INTEGER-exact ranking (c_ab*1e12 div (c_a*c_b) — constants cancel,
    no libm log at the ranking boundary) and (tok_a, tok_b) tie-break.
    One bigram explode; unigram counts re-aggregated from the persisted
    pair vocabulary, never the corpus (operators/tfidf.pmi_top_pairs)."""
    from mintpy_spark.operators.tfidf import pmi_top_pairs

    docs = load(spark, sf_dir, "documents")
    return pmi_top_pairs(
        docs, text_col="text", top_k=_PMI_TOPK, min_pair_count=_PMI_MIN
    )


@_q("dedup_cdc_chunks", D.cdc_chunk_oracle_sql(window_mod=_CDC_MOD))
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking dedup census (LBFS/rsync boundary rule
    on token hashes): per document, total chunks, chunks whose string
    occurs >= 2 times corpus-wide, and the basis-point fraction.
    Insertion-robust where fixed-k windows shift; ~window_mod x cheaper
    explode than the span census; same one-repartition census tail
    (operators/dedup.cdc_chunk_dedup)."""
    docs = load(spark, sf_dir, "documents")
    return D.cdc_chunk_dedup(docs, window_mod=_CDC_MOD)
