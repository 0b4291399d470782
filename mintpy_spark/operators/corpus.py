"""Corpus-level text statistics: readability census and Heaps'-law
vocabulary growth.

Reference analog: the engine-side descriptive statistics family
(`info.py` metadata summaries, `utils/utils0.py` stats helpers) applied
to the text channel — a training-data pipeline profiles its corpus the
way the reference profiles a stack before inversion. Complements the
existing token/Zipf/TTR operators (tfidf.py, queries_r3vv) with the two
classic corpus curves they don't cover: per-document readability scores
(Flesch / Flesch-Kincaid) and the vocabulary-vs-tokens growth curve
(Heaps' law), which data-curation teams use to spot synthetic or
template-heavy corpora (a saturating curve = low lexical diversity).

All outputs are exact integers or floor-quantized basis points, per the
engine's micro-quantize-at-the-boundary discipline — every expression is
written in the same operation order as its DuckDB oracle so the driver
hash is byte-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Deterministic tokenizer shared with the oracles: lowercase [a-z]+ runs.
_TOKEN_RE = "[a-z]+"
# Syllable proxy: maximal vowel-group runs (classic heuristic; exact and
# locale-free, unlike dictionary syllabification).
_VOWEL_RE = "[aeiouy]+"


def _count_matches(text_col: str, pattern: str) -> Column:
    # coalesce first: F.size returns -1 for a NULL array while the SQL
    # oracles' len(regexp_extract_all(NULL)) returns NULL — '' gives the
    # portable zero on both sides
    return F.size(
        F.expr(
            f"regexp_extract_all(lower(coalesce({text_col}, '')),"
            f" '{pattern}', 0)"
        )
    )


def readability_scores(
    df: DataFrame,
    text_col: str = "text",
    words_per_sentence: int = 15,
) -> DataFrame:
    """Per-document Flesch reading-ease and Flesch-Kincaid grade level,
    floor-quantized to basis points.

    The corpus has no sentence punctuation (synthetic web text), so the
    sentence unit is a fixed window of ``words_per_sentence`` tokens —
    a deterministic stand-in documented in the score columns' contract;
    with punctuated text the same formula applies with real sentence
    counts. Words are ``[a-z]+`` runs; syllables are ``[aeiouy]+`` runs
    (vowel-group heuristic, 0 for vowelless tokens).

    Zero-shuffle: every column is row-local scan-stage codegen.
    """
    wps = int(words_per_sentence)
    w = _count_matches(text_col, _TOKEN_RE)
    sy = _count_matches(text_col, _VOWEL_RE)
    s = F.floor((w + F.lit(wps - 1)) / F.lit(wps)).cast("long")
    wd = w.cast("double")
    sd = s.cast("double")
    syd = sy.cast("double")
    flesch = (
        F.lit(206.835) - F.lit(1.015) * (wd / sd) - F.lit(84.6) * (syd / wd)
    )
    fk = F.lit(0.39) * (wd / sd) + F.lit(11.8) * (syd / wd) - F.lit(15.59)
    return df.select(
        *df.columns,
        w.alias("n_words"),
        sy.alias("n_syllables"),
        s.alias("n_sentences"),
        F.when(w > 0, F.floor(flesch * F.lit(100)).cast("long")).alias(
            "flesch_bp"
        ),
        F.when(w > 0, F.floor(fk * F.lit(100)).cast("long")).alias("fk_bp"),
    )


def heaps_curve(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10,
) -> DataFrame:
    """Cumulative (documents, tokens, distinct vocabulary) after each of
    ``buckets`` equal document-count prefixes in ``id_col`` order — the
    empirical Heaps'-law curve V(T), exact integers throughout.

    Bucket rule (shared with the oracle): rank documents by id, bucket =
    ((rank-1)*buckets) // N + 1; row ``d`` reports totals over buckets
    <= d.

    Scale: tokens reduce to one row per document and one row per distinct
    word (vocabulary-sized) before any window; the only ordered pass is a
    row_number over the DOC-level table. In-query that is a global sort
    for oracle parity; a production ingest assigns the prefix rank at
    write time (the manifest records per-partition document counts, so
    rank = partition offset + local index — no sort). The final cumsum
    runs over ``buckets`` rows.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{_TOKEN_RE}', 0)")
        ).alias("w"),
    )
    # per-doc token counts are row-local (array size) — no explode, no
    # join; zero-token docs keep their rank slot for free
    all_docs = df.select(
        F.col(id_col),
        _count_matches(text_col, _TOKEN_RE).cast("long").alias("ntok"),
    )
    n = all_docs.count()
    b = int(buckets)
    if n == 0:
        # empty input: the bucket expression would divide by zero (NULL
        # buckets in Spark, an error in DuckDB) — return the empty curve
        spark = df.sparkSession
        return spark.createDataFrame(
            [], "bucket int, docs_cum long, tokens_cum long, vocab_cum long"
        )
    ranked = all_docs.withColumn(
        "rn", F.row_number().over(Window.orderBy(id_col))
    ).withColumn(
        # exact integer division — a double quotient cast could round
        # across a bucket boundary
        "bucket", F.expr(f"(rn - 1) * {b} div {n}") + F.lit(1)
    )
    doc_bucket = ranked.select(id_col, "bucket", "ntok")
    tok_per_bucket = doc_bucket.groupBy("bucket").agg(
        F.sum("ntok").alias("tok"), F.count("*").alias("docs")
    )
    firsts = toks.groupBy("w").agg(F.min(id_col).alias("d0"))
    # vocabulary-sized probe side joins the doc->bucket map; AQE picks
    # broadcast when either side is small, sort-merge at 10^12 docs
    vocab_per_bucket = (
        firsts.join(doc_bucket.select(F.col(id_col).alias("d0"), "bucket"), "d0")
        .groupBy("bucket")
        .agg(F.count("*").alias("vocab"))
    )
    curve = tok_per_bucket.join(vocab_per_bucket, "bucket", "left").fillna(
        {"vocab": 0}
    )
    cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return curve.select(
        "bucket",
        F.sum("docs").over(cum).cast("long").alias("docs_cum"),
        F.sum("tok").over(cum).cast("long").alias("tokens_cum"),
        F.sum("vocab").over(cum).cast("long").alias("vocab_cum"),
    )
