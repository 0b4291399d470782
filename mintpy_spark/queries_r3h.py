"""Round-3 additions, batch h: exact substring-span deduplication (the
Lee et al. 2022 duplicated-window census) per document and rolled up per
source — the domain-level filtering decision a Common-Crawl curation
pipeline makes (drop sources whose content is mostly boilerplate/copy)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.operators import dedup as D
from mintpy_spark.queries import _q, load

_SPANS_K = 8


@_q(
    "dedup_substring_spans",
    D.substring_spans_oracle_sql(k=_SPANS_K),
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated k-token-window census (exact substring
    dedup signal, Lee et al. 2022): n_windows, dup_windows, and the
    exact-integer basis-point fraction. Two hash aggs + one hash join on
    a 60-bit window hash; the window strings never shuffle
    (operators/dedup.duplicated_window_fraction)."""
    docs = load(spark, sf_dir, "documents")
    return D.duplicated_window_fraction(docs, k=_SPANS_K)


@_q(
    "source_dup_profile",
    f"""
    WITH per_doc AS ({D.substring_spans_oracle_sql(k=_SPANS_K)})
    SELECT d.source,
           COUNT(*)::BIGINT AS n_docs,
           COUNT(p.n_windows)::BIGINT AS n_scored,
           CAST(COALESCE(SUM(p.n_windows), 0) AS BIGINT) AS n_windows,
           CAST(COALESCE(SUM(p.dup_windows), 0) AS BIGINT) AS dup_windows,
           CAST(CASE WHEN COALESCE(SUM(p.n_windows), 0) > 0
                     THEN floor(SUM(p.dup_windows) * 10000.0
                                / SUM(p.n_windows) + 0.5)
                     ELSE 0 END AS BIGINT) AS dup_bp
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    GROUP BY d.source
    """,
)
def source_dup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level duplication profile: the per-document window census
    aggregated per source (basis points of duplicated windows over the
    source's whole corpus) — the statistic a curation pipeline thresholds
    to drop high-boilerplate domains. Composition of the substring-span
    operator with one more partial+final agg; the doc_id join is keyed on
    the corpus primary key, so it co-partitions with any doc-id-bucketed
    layout at scale."""
    docs = load(spark, sf_dir, "documents")
    per_doc = D.duplicated_window_fraction(docs, k=_SPANS_K)
    j = docs.select("doc_id", "source").join(per_doc, "doc_id", "left")
    n_win = F.coalesce(F.sum("n_windows"), F.lit(0))
    n_dup = F.coalesce(F.sum("dup_windows"), F.lit(0))
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count("n_windows").cast("long").alias("n_scored"),
            n_win.cast("long").alias("n_windows"),
            n_dup.cast("long").alias("dup_windows"),
        )
        .withColumn(
            "dup_bp",
            F.when(
                F.col("n_windows") > 0,
                F.floor(
                    F.col("dup_windows") * F.lit(10000.0)
                    / F.col("n_windows")
                    + F.lit(0.5)
                ),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )
