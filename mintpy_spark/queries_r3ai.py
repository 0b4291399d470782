"""Round-3 batch ai: BM25 ranked retrieval, BPE pair census, Siegel
repeated-median velocity, and the daily high/low-with-timestamp tier.

Same oracle discipline as mintpy_spark.queries: identical aliases both
sides, in-query rounding both sides, integer arithmetic wherever a
ranking or a comparison crosses the engine boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.operators.tfidf import bm25_oracle_sql
from mintpy_spark.queries import _DY_SQL, _q, load

_BM25_TERMS = ["spark", "window", "hash"]


@_q("index_bm25_topk", bm25_oracle_sql(_BM25_TERMS, top_k=10))
def index_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked top-10 documents for a 3-term query (Okapi/Lucene
    variant with the +1 idf floor) — the ranked companion of the
    conjunctive index search. Per-(doc,term) scores are micro-quantized
    integers summed exactly; the top-k is orderBy+limit (TakeOrdered),
    never a global sort; df/avgdl ride broadcasts."""
    from mintpy_spark.operators.tfidf import bm25_topk

    docs = load(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, top_k=10)


@_q(
    "bpe_pair_census",
    """
    WITH toks AS (
      SELECT lang, list_filter(string_split(text, ' '), t -> t <> '') AS t
      FROM documents
    ),
    pairs AS (
      SELECT lang, t[i] AS w1, t[i + 1] AS w2
      FROM toks, UNNEST(range(1, len(t))) AS r(i)
      WHERE len(t) >= 2
    ),
    counted AS (
      SELECT lang, w1, w2, COUNT(*) AS cnt FROM pairs GROUP BY 1, 2, 3
    )
    SELECT lang, rnk, w1, w2, cnt FROM (
      SELECT lang, w1, w2, cnt,
             CAST(row_number() OVER (
               PARTITION BY lang ORDER BY cnt DESC, w1, w2
             ) AS BIGINT) AS rnk
      FROM counted
    ) WHERE rnk <= 3
    """,
)
def bpe_pair_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge-round census (Sennrich 2016): the top-3 most
    frequent adjacent token pairs per language. Pairs are built
    row-locally from the staged token array (no token-stream self-join);
    one hash agg with map-side partials; the rank window runs over the
    Heaps-bounded pair vocabulary, not the corpus."""
    from mintpy_spark.operators.tfidf import adjacent_pair_census

    docs = load(spark, sf_dir, "documents")
    return adjacent_pair_census(docs, group="lang", top_k=3)


@_q(
    "velocity_siegel",
    f"""
    WITH base AS (
      SELECT user_id,
             {_DY_SQL.format(t='ts')} - 2024.0 AS t,
             CAST(value AS DOUBLE) AS v,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, value) AS rn
      FROM events
    ),
    inner_m AS (
      SELECT a.user_id AS user_id, a.rn AS rn,
             median((b.v - a.v) / (b.t - a.t)) AS mi
      FROM base a JOIN base b
        ON a.user_id = b.user_id
       AND b.rn <> a.rn
       AND abs(b.rn - a.rn) <= 10
       AND b.t <> a.t
      GROUP BY a.user_id, a.rn
    )
    SELECT user_id, ROUND(median(mi), 4) AS velocity,
           COUNT(*) AS num_points
    FROM inner_m GROUP BY user_id
    """,
)
def velocity_siegel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Siegel repeated-median velocity (50% breakdown — the maximum):
    median over observations of the median in-band pairwise slope. The
    engine builds each center's neighbor slopes from 2x10 lag/lead
    columns in ONE window pass (no self-join; the oracle's banded
    self-join is the independent formulation) and takes the inner median
    row-locally from the sorted array."""
    from mintpy_spark.operators.robust import siegel_velocity

    ev = load(spark, sf_dir, "events")
    out = siegel_velocity(
        ev, "value", key="user_id", ts="ts", max_lag=10, ref_year=2024.0,
        order_cols=("value",),
    )
    return out.select(
        "user_id", F.round("velocity", 4).alias("velocity"), "num_points"
    )


@_q(
    "rollup_1d_hilo",
    """
    SELECT user_id,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
           ROUND((max({'v': value, 'nm': -epoch_us(ts), 't': ts})).v, 4)
             AS hi_v,
           (max({'v': value, 'nm': -epoch_us(ts), 't': ts})).t AS hi_t,
           ROUND((min({'v': value, 'm': epoch_us(ts), 't': ts})).v, 4)
             AS lo_v,
           (min({'v': value, 'm': epoch_us(ts), 't': ts})).t AS lo_t,
           COUNT(value) AS cnt
    FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    """,
)
def rollup_1d_hilo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extremum-with-timestamp daily tier: the value high/low per
    (key, day) and the timestamp each was FIRST reached — struct-min/max
    partials with negated-microsecond tie inversion, so ties are
    engine- and partitioning-independent; one map-side-combining hash
    aggregation, mergeable into coarser tiers."""
    from mintpy_spark.operators.rollup import rollup_hilo

    ev = load(spark, sf_dir, "events")
    t = rollup_hilo(ev, "value", "1d", key="user_id", ts="ts")
    return t.select(
        "user_id", "bucket_start",
        F.round("hi_v", 4).alias("hi_v"), "hi_t",
        F.round("lo_v", 4).alias("lo_v"), "lo_t",
        "cnt",
    )
