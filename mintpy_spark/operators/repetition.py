"""Within-document repetition profiling — the Gopher/MassiveText
quality-filter family (Rae et al. 2021, public convention): documents
dominated by a single repeated word or by duplicated n-gram spans are
low-quality (keyword stuffing, scraper loops, template damage) and get
filtered before training.

Reference analog: the residual-RMS epoch screen (timeseries_rms.py) —
a per-unit self-consistency statistic thresholded to drop bad units —
applied to a document's own token stream.

Scale shape:
- the duplicate-n-gram fractions are ROW-LOCAL array expressions
  (size - size(array_distinct) over the gram array) — whole-stage
  codegen, zero shuffle;
- the top-word fraction needs per-(doc, word) counts: one explode
  aggregated immediately with map-side combine, then a per-doc max —
  the standard inverted-index shape, shuffling (doc, word) partials
  only.

Exact integer counts throughout; each fraction is a single float
division at the end (engine-identical)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mintpy_spark.functions.scalars import nonempty_tokens


def _grams(words, n: int):
    """n-gram array of a word array (empty when fewer than n words)."""
    k = F.size(words) - (n - 1)
    g = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + j + 1) for j in range(n)]
        ),
    )
    return F.when(k >= 1, g).otherwise(F.array().cast("array<string>"))


def repetition_profile(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_words, top_word_frac, dup2_frac, dup3_frac) per document
    with at least one token.

    top_word_frac = occurrences of the most frequent word / n_words;
    dupN_frac     = (n-grams − distinct n-grams) / n-grams (0.0 when the
    document has no n-grams, i.e. fewer than N words — no evidence of
    repetition is not repetition)."""
    # Stage every multiply-referenced array through its own projection:
    # CollapseProject would otherwise re-inline the token split into each
    # gram build and each gram array into its three consumers (size,
    # distinct-size, guard) — measured ~10x on this shape (memory:
    # CollapseProject re-inlines expensive expressions).
    wdf = docs.select(id_col, nonempty_tokens(F.col(text_col)).alias("_ws"))
    gdf = wdf.withColumn("_g2", _grams(F.col("_ws"), 2)).withColumn(
        "_g3", _grams(F.col("_ws"), 3)
    )
    counted = gdf.select(
        id_col,
        F.size("_ws").alias("n_words"),
        F.size("_g2").alias("_n2"),
        F.size(F.array_distinct("_g2")).alias("_u2"),
        F.size("_g3").alias("_n3"),
        F.size(F.array_distinct("_g3")).alias("_u3"),
    ).where(F.col("n_words") > 0)

    def frac(n, u):
        return F.when(
            F.col(n) > 0,
            F.round(
                (F.col(n) - F.col(u)).cast("double") / F.col(n).cast("double"), 4
            ),
        ).otherwise(F.lit(0.0))

    staged = counted.select(
        id_col,
        "n_words",
        frac("_n2", "_u2").alias("dup2_frac"),
        frac("_n3", "_u3").alias("dup3_frac"),
    )
    tok = wdf.select(id_col, F.explode("_ws").alias("w"))
    top = (
        tok.groupBy(id_col, "w")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("_top"))
    )
    return staged.join(top, id_col).select(
        id_col,
        "n_words",
        F.round(
            F.col("_top").cast("double") / F.col("n_words").cast("double"), 4
        ).alias("top_word_frac"),
        "dup2_frac",
        "dup3_frac",
    )
