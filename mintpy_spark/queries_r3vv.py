"""Round-3 batch vv: second-order LM scoring and vocabulary statistics.

* ``doc_bigram_logprob`` — add-one-smoothed bigram log-probability per
  doc under the corpus's own bigram model (operators/tfidf.
  bigram_logprob): the order-sensitive fluency filter that unigram
  scoring cannot express (a shuffled fluent paragraph keeps its unigram
  score, loses its bigram score).
* ``text_ttr_hapax`` — per-doc lexical diversity: type-token ratio in
  exact rounded bp plus within-doc hapax count.
* ``vocab_frequency_census`` — per-language corpus vocabulary census:
  vocabulary size, hapax/dis-legomena counts (the Zipf tail the
  dedup + quality filters feed on), max term frequency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

_TOKS_SQL = "list_filter(string_split(text, ' '), x -> x <> '')"


@_q(
    "doc_bigram_logprob",
    f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), uni AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(toks) AS term FROM tok) GROUP BY 1
    ), v AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni
    ), bg AS (
      SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bg, toks[i] AS w1
      FROM tok, unnest(range(1, len(toks))) AS r(i)
      WHERE len(toks) >= 2
    ), fbg AS (
      SELECT bg, CAST(COUNT(*) AS BIGINT) AS cbg FROM bg GROUP BY 1
    ), scored AS (
      SELECT bg.doc_id,
             CAST(floor(ln((fbg.cbg + 1.0)
                           / (CAST(uni.c AS DOUBLE) + CAST(v.v AS DOUBLE)))
                        * 1000000.0 + 0.5) AS BIGINT) AS lpq
      FROM bg JOIN fbg USING (bg)
      JOIN uni ON bg.w1 = uni.term
      CROSS JOIN v
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(lpq) AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE) * 1000000.0), 4) AS logprob
    FROM scored GROUP BY 1
    """,
)
def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean bigram log-probability per document, Laplace-smoothed over
    the corpus vocabulary. Bigrams are built row-locally from the staged
    token array (no token-stream self-join), the unigram table
    broadcasts, the bigram-frequency join stays key-keyed for AQE.
    Micro-nat quantization before the per-doc sum keeps the mean
    partitioning-exact (same recipe as doc_unigram_logprob)."""
    from mintpy_spark.operators.tfidf import bigram_logprob

    return bigram_logprob(load(spark, sf_dir, "documents"))


@_q(
    "text_ttr_hapax",
    f"""
    WITH tok AS (
      SELECT doc_id, t.term
      FROM documents,
           unnest({_TOKS_SQL}) AS t(term)
    ), tc AS (
      SELECT doc_id, term, COUNT(*) AS c FROM tok GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           CAST((20000 * COUNT(*) + SUM(c)) // (2 * SUM(c)) AS BIGINT)
             AS ttr_bp
    FROM tc GROUP BY 1
    """,
)
def text_ttr_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc lexical diversity: type count, within-doc hapax count and
    the type-token ratio as a rounded integer division (low TTR = loops
    of repeated boilerplate; TTR ~ 1 = no reuse at all, often tables or
    id dumps — both filter targets). One explode, then two aggregations
    co-keyed on doc_id (the (doc, term) agg shuffles on the same prefix
    the doc_id agg consumes — one Exchange)."""
    from mintpy_spark.functions.scalars import nonempty_tokens

    d = load(spark, sf_dir, "documents")
    tc = d.select(
        "doc_id", F.explode(nonempty_tokens("text")).alias("term")
    ).groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    return tc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
        F.expr("(20000 * COUNT(*) + SUM(c)) DIV (2 * SUM(c))")
        .cast("long")
        .alias("ttr_bp"),
    )


@_q(
    "vocab_frequency_census",
    f"""
    WITH tok AS (
      SELECT lang, t.term
      FROM documents,
           unnest({_TOKS_SQL}) AS t(term)
    ), tc AS (
      SELECT lang, term, COUNT(*) AS c FROM tok GROUP BY 1, 2
    )
    SELECT lang,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dis,
           CAST(MAX(c) AS BIGINT) AS max_freq,
           CAST((20000 * SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) + COUNT(*))
                // (2 * COUNT(*)) AS BIGINT) AS hapax_bp
    FROM tc GROUP BY 1
    """,
)
def vocab_frequency_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary census per language: Heaps-law vocabulary size,
    hapax and dis-legomena counts (Good-Turing mass — what smoothing and
    trie-size planning read), hottest term frequency, hapax share in bp.
    The (lang, term) agg is the only shuffle; Zipf-hot terms are
    map-side partial-combined before it. The per-lang fold is
    vocabulary-sized input, not corpus-sized."""
    from mintpy_spark.functions.scalars import nonempty_tokens

    d = load(spark, sf_dir, "documents")
    tc = d.select(
        "lang", F.explode(nonempty_tokens("text")).alias("term")
    ).groupBy("lang", "term").agg(F.count("*").alias("c"))
    return tc.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n_dis"),
        F.max("c").cast("long").alias("max_freq"),
        F.expr(
            "(20000 * SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) + COUNT(*))"
            " DIV (2 * COUNT(*))"
        )
        .cast("long")
        .alias("hapax_bp"),
    )
