"""Round-3 additions, batch g: within-document repetition profiling
(the Gopher/MassiveText quality-filter family) and cross-document
boilerplate coverage (the C4 repeated-line rule)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load


@_q(
    "text_repetition_profile",
    """
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ws
      FROM documents),
    g AS (
      SELECT doc_id, ws, len(ws) AS n_words,
             [ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))] AS g2,
             [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
              FOR i IN range(1, len(ws) - 1)] AS g3
      FROM w WHERE len(ws) > 0),
    top AS (
      SELECT doc_id, MAX(c) AS top_c FROM (
        SELECT doc_id, t.w, COUNT(*) AS c
        FROM w, unnest(ws) AS t(w) GROUP BY doc_id, t.w)
      GROUP BY doc_id)
    SELECT g.doc_id,
           CAST(g.n_words AS INT) AS n_words,
           ROUND(CAST(top.top_c AS DOUBLE) / g.n_words, 4) AS top_word_frac,
           CASE WHEN len(g2) > 0
                THEN ROUND((len(g2) - len(list_distinct(g2)))::DOUBLE
                           / len(g2), 4)
                ELSE 0.0 END AS dup2_frac,
           CASE WHEN len(g3) > 0
                THEN ROUND((len(g3) - len(list_distinct(g3)))::DOUBLE
                           / len(g3), 4)
                ELSE 0.0 END AS dup3_frac
    FROM g JOIN top USING (doc_id)
    """,
)
def text_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: most-frequent
    -word fraction and duplicate 2-/3-gram fractions
    (operators/repetition.py). The n-gram fractions are row-local array
    expressions (zero shuffle); the top-word count is one inverted-index
    aggregation."""
    from mintpy_spark.operators.repetition import repetition_profile

    docs = load(spark, sf_dir, "documents")
    out = repetition_profile(docs, text_col="text", id_col="doc_id")
    return out.select(
        "doc_id",
        F.col("n_words").cast("int").alias("n_words"),
        "top_word_frac",
        "dup2_frac",
        "dup3_frac",
    )


@_q(
    "boilerplate_coverage",
    """
    WITH l AS (
      SELECT source, doc_id, trim(t.line) AS line
      FROM documents, unnest(string_split(text, chr(10))) AS t(line)),
    nz AS (
      SELECT source, doc_id,
             ('0x' || substring(md5(line), 1, 15))::BIGINT AS line_hash
      FROM l WHERE line <> ''),
    boiler AS (
      SELECT source, line_hash FROM nz
      GROUP BY source, line_hash HAVING COUNT(DISTINCT doc_id) >= 2)
    SELECT nz.source, nz.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(boiler.line_hash) AS BIGINT) AS n_boiler,
           ROUND(COUNT(boiler.line_hash)::DOUBLE / COUNT(*), 4) AS boiler_frac
    FROM nz LEFT JOIN boiler
      ON nz.source = boiler.source AND nz.line_hash = boiler.line_hash
    GROUP BY nz.source, nz.doc_id
    """,
)
def boilerplate_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate coverage per document: the fraction of a
    doc's non-empty lines that recur in >= 2 distinct documents of the
    same source (operators/boilerplate.py — the common-mask rule applied
    to lines). The synthetic corpus carries single-line documents, so
    here the rule degenerates to exact-duplicate coverage; the multi-line
    path is pinned by unit tests."""
    from mintpy_spark.operators.boilerplate import boilerplate_coverage as _op

    docs = load(spark, sf_dir, "documents")
    return _op(docs, text_col="text", id_col="doc_id", group="source", min_docs=2)
