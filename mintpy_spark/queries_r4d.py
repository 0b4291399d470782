"""Round-4 batch d: corpus curves — per-document readability census and
the Heaps'-law vocabulary-growth curve (operators/corpus.py). Both are
exact under the driver oracle: integer counts throughout, with the two
readability scores floor-quantized to basis points from an expression
written in the identical operation order on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mintpy_spark.queries import _q, load


@_q(
    "text_readability_census",
    """
    WITH m AS (
      SELECT doc_id,
             len(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+'))
               AS n_words,
             len(regexp_extract_all(lower(coalesce(text, '')), '[aeiouy]+'))
               AS n_syllables
      FROM documents
    ), s AS (
      SELECT doc_id, n_words, n_syllables,
             (n_words + 14) // 15 AS n_sentences
      FROM m
    )
    SELECT doc_id, n_words, n_syllables, n_sentences,
           CASE WHEN n_words > 0 THEN CAST(FLOOR(
             (206.835
              - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
              - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
             ) * 100) AS BIGINT) END AS flesch_bp,
           CASE WHEN n_words > 0 THEN CAST(FLOOR(
             (0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
              + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
              - 15.59
             ) * 100) AS BIGINT) END AS fk_bp
    FROM s
    """,
)
def text_readability_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Flesch reading-ease + Flesch-Kincaid grade, with the
    word/syllable/pseudo-sentence counts that feed them. Sentence unit is
    a fixed 15-token window (the corpus carries no punctuation); words
    are [a-z]+ runs, syllables [aeiouy]+ vowel-group runs — all
    deterministic, so the scores are floor-exact against the oracle.

    Reference analog: the pre-inversion stack profiling habit (info.py /
    utils stats) applied to the text channel; in a curation pipeline
    these scores gate the quality tier next to the Gopher flags
    (operators/curation.py:193).

    Scale: zero shuffle — every column is row-local regexp work in the
    scan stage, whole-stage codegen end to end.
    """
    from mintpy_spark.operators.corpus import readability_scores

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return readability_scores(docs).select(
        "doc_id", "n_words", "n_syllables", "n_sentences",
        "flesch_bp", "fk_bp",
    )


@_q(
    "corpus_heaps_curve",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      FROM documents
    ), per_doc AS (
      SELECT d.doc_id, COALESCE(t.ntok, 0) AS ntok
      FROM documents d
      LEFT JOIN (SELECT doc_id, COUNT(*) AS ntok FROM tok GROUP BY 1) t
        USING (doc_id)
    ), ranked AS (
      SELECT doc_id, ntok,
             (row_number() OVER (ORDER BY doc_id) - 1) * 10
               // (SELECT COUNT(*) FROM per_doc) + 1 AS bucket
      FROM per_doc
    ), tokb AS (
      SELECT bucket, SUM(ntok) AS tok, COUNT(*) AS docs
      FROM ranked GROUP BY 1
    ), firsts AS (
      SELECT w, MIN(doc_id) AS d0 FROM tok GROUP BY 1
    ), vocb AS (
      SELECT r.bucket, COUNT(*) AS vocab
      FROM firsts f JOIN ranked r ON f.d0 = r.doc_id
      GROUP BY 1
    )
    SELECT t.bucket,
           CAST(SUM(t.docs)  OVER c AS BIGINT) AS docs_cum,
           CAST(SUM(t.tok)   OVER c AS BIGINT) AS tokens_cum,
           CAST(SUM(COALESCE(v.vocab, 0)) OVER c AS BIGINT) AS vocab_cum
    FROM tokb t LEFT JOIN vocb v USING (bucket)
    WINDOW c AS (ORDER BY t.bucket ROWS UNBOUNDED PRECEDING)
    """,
)
def corpus_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law curve: cumulative (docs, tokens, distinct vocabulary)
    after each tenth of the corpus in doc_id order — exact integers. A
    vocabulary that saturates early (as this synthetic corpus does, 31
    words) flags template/synthetic content; natural web text grows as
    V ~ k*T^b with b in 0.4-0.6.

    Scale notes in operators/corpus.py:heaps_curve — tokens reduce to
    doc-level and vocabulary-level rows before any ordered pass; the
    in-query doc-level row_number is the oracle-parity stand-in for the
    ingest manifest's write-time prefix ranks.
    """
    from mintpy_spark.operators.corpus import heaps_curve

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return heaps_curve(docs, buckets=10)
