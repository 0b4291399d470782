"""Round-3 additions, batch e: counter rate (PromQL ``rate()``),
inter-arrival cadence profiling (CV of gaps), and corpus TF-IDF top
terms — the remaining "would a production tier store + LLM-data pipeline
need this" gaps: per-second rates over wrapping counters, scrape-cadence
diagnostics ahead of gap-fill, and characteristic-term extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load


@_q(
    "counter_rate_1d",
    """
    WITH c AS (
      SELECT user_id, ts,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER
               (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) % 100000 AS ctr
      FROM events),
    d AS (
      SELECT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
             CASE WHEN prev IS NULL THEN NULL
                  WHEN ctr >= prev THEN ctr - prev
                  ELSE ctr END AS dd,
             epoch_us(ts) AS e
      FROM (SELECT user_id, ts, ctr,
                   lag(ctr) OVER (PARTITION BY user_id ORDER BY ts) AS prev
            FROM c WHERE ctr IS NOT NULL)),
    a AS (
      SELECT user_id, bucket_start,
             CAST(SUM(dd) AS BIGINT) AS increase,
             MAX(e) - MIN(e) AS span_us
      FROM d GROUP BY 1, 2)
    SELECT user_id, bucket_start, increase, span_us,
           CASE WHEN span_us > 0 AND increase IS NOT NULL
                THEN ROUND(CAST(increase AS DOUBLE)
                           / (CAST(span_us AS DOUBLE) / 1000000.0), 6)
           END AS rate
    FROM a
    """,
)
def counter_rate_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL-style rate() per day over the same synthesized wrapping
    integer counter as counter_increase_1d: reset-aware increase divided
    by the observed sample span inside the bucket, measured in integer
    microseconds (operators/counter.counter_rate)."""
    from mintpy_spark.operators.counter import counter_rate

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cents = F.round(F.col("value") * 100).cast("long")
    ctr = (F.sum(cents).over(w) % 100000).alias("ctr")
    series = ev.select("user_id", "ts", ctr)
    return counter_rate(series, "ctr", tier="1d", key="user_id", ts="ts")


@_q(
    "cadence_interarrival_cv",
    """
    WITH g AS (
      SELECT user_id,
             epoch_us(ts)
               - lag(epoch_us(ts))
                 OVER (PARTITION BY user_id ORDER BY ts) AS gap
      FROM events),
    a AS (
      SELECT user_id,
             CAST(COUNT(gap) AS BIGINT) AS n_gaps,
             CAST(SUM(gap) AS BIGINT) AS s1,
             SUM(CAST(gap AS HUGEINT) * gap) AS s2
      FROM g WHERE gap IS NOT NULL GROUP BY user_id)
    SELECT user_id, n_gaps,
           ROUND(CAST(s1 AS DOUBLE) / n_gaps / 1000000.0, 4) AS mean_gap_s,
           ROUND(sqrt(CAST(n_gaps * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
                      / (n_gaps - 1) / n_gaps)
                 * n_gaps / s1, 4) AS cv
    FROM a WHERE n_gaps >= 2 AND s1 > 0
    """,
)
def cadence_interarrival_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling-cadence profile per series: mean inter-arrival seconds and
    the coefficient of variation of gaps (CV ~ 0 metronomic, 1 Poisson,
    > 1 bursty) — the ptime.py date-list regularity diagnostic as one
    windowed aggregation (operators/cadence.py). Exact integer partials;
    the sqrt/divide sequence is op-for-op identical in the oracle."""
    from mintpy_spark.operators.cadence import interarrival_stats

    ev = load(spark, sf_dir, "events")
    return interarrival_stats(ev, key="user_id", ts="ts")


@_q(
    "tfidf_top_terms",
    """
    WITH tok AS (
      SELECT source, doc_id, t.term
      FROM documents,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t(term)),
    tf AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY source, term),
    df AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM tok GROUP BY term),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    scored AS (
      SELECT tf.source, tf.term, tf.tf, df.df,
             tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
      WHERE df.df < n.n),
    ranked AS (
      SELECT source, term, tf, df, score,
             row_number() OVER (PARTITION BY source
                                ORDER BY score DESC, term ASC) AS rank
      FROM scored)
    SELECT source, CAST(rank AS INT) AS rank, term, tf, df,
           ROUND(score, 6) AS score
    FROM ranked WHERE rank <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3 most characteristic terms per source by TF-IDF
    (operators/tfidf.py): tf = in-group occurrences, df = corpus-wide
    distinct-document frequency, score = tf * ln(N/df). The inverted-index
    plan — token explode aggregated with map-side partials, a
    vocabulary-sized tf-df join, 1-row broadcast N, one top-k window."""
    from mintpy_spark.operators.tfidf import tfidf_top_terms as _op

    docs = load(spark, sf_dir, "documents")
    return _op(docs, text_col="text", id_col="doc_id", group="source", k=3)
