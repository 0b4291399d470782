"""Corpus-curation operators: benchmark decontamination and rule-based
document quality filtering (the Gopher/MassiveText filter family).

Round-3 batch i. These are the two filtering decisions every LLM
training-data pipeline makes between raw crawl and training shard:

* **Decontamination** — drop (or flag) training documents that share
  k-gram overlap with an evaluation/benchmark set, so downstream eval
  numbers aren't inflated by memorized test data (GPT-3 appendix C,
  arXiv:2005.14165, uses 13-gram overlap; PaLM and Llama use the same
  shape with different k).
* **Quality rule flags** — the deterministic per-document heuristics of
  Gopher/MassiveText (Rae et al. 2021, arXiv:2112.11446, App. A1.1):
  word-count bounds, mean-word-length band, symbol-to-word ratio,
  alphabetic-word ratio, stop-word presence. Line-level rules
  (bullet/ellipsis line fractions) live in operators/boilerplate.py.

Reference parity: extends the engine per the build brief (training-data
pipeline ops as first-class components); no MintPy analog — the closest
reference pattern is threshold mask generation
(src/mintpy/generate_mask.py:44 create_threshold_mask), which is exactly
what gopher_flags is: boolean masks from value thresholds, here over
text statistics instead of pixel values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mintpy_spark.operators.dedup import window_hash_positions

# The Gopher stop-word list (arXiv:2112.11446 App. A1.1: "contains at
# least 2 of the following English words").
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def benchmark_window_hashes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, mod: int = 20,
) -> DataFrame:
    """Distinct k-token-window hashes of the held-out benchmark slice
    (``id % mod == 0`` — the deterministic stand-in for an external eval
    suite; in production this is the real benchmark corpus, always tiny
    relative to training data). One small distinct-agg; the result is
    the broadcast side of the decontamination join."""
    bench = docs.where(F.col(id_col) % mod == 0)
    return (
        window_hash_positions(bench, id_col=id_col, text_col=text_col, k=k)
        .select("h")
        .distinct()
    )


def decontaminate(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, mod: int = 20,
) -> DataFrame:
    """Per-training-document benchmark contamination census: for every
    non-benchmark document, count k-token window positions whose window
    string also occurs in the benchmark slice.

    Returns (id_col, n_windows, hit_windows, hit_bp, contaminated) —
    hit_bp the exact-integer basis-point fraction (floor(x*1e4 + 0.5),
    engine-portable), contaminated = 1 iff any window hits (the GPT-3
    appendix-C decision, which removes the document; keeping the count
    lets a pipeline threshold instead of hard-dropping).

    Plan shape / 100 TB notes:
    * The benchmark side is fixed-size (eval suites don't grow with the
      crawl) — a few million hashes at most — so it BROADCASTs; the
      training side's window explode is row-local and the only shuffle
      is the final per-document re-aggregation. One Exchange total.
    * Left-join + conditional count (not semi-join) so zero-hit
      documents still report n_windows — a semi-join would silently
      drop them from the census.
    * At benchmark sizes past executor memory, the standard cheapening
      is a Bloom filter over the hash set (false positives only ever
      over-flag); this exact form is the baseline such a variant is
      validated against.
    """
    bench = benchmark_window_hashes(
        docs, id_col=id_col, text_col=text_col, k=k, mod=mod
    ).withColumn("_hit", F.lit(1))
    train = docs.where(F.col(id_col) % mod != 0)
    pos = window_hash_positions(train, id_col=id_col, text_col=text_col, k=k)
    j = pos.join(F.broadcast(bench), "h", "left")
    hits = F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
    return (
        j.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            hits.cast("long").alias("hit_windows"),
        )
        .select(
            F.col(id_col),
            "n_windows",
            "hit_windows",
            F.floor(
                F.col("hit_windows") * F.lit(10000.0) / F.col("n_windows")
                + F.lit(0.5)
            ).cast("long").alias("hit_bp"),
            (F.col("hit_windows") > 0).cast("int").alias("contaminated"),
        )
    )


def decontaminate_oracle_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, mod: int = 20,
) -> str:
    """DuckDB twin of decontaminate — identical tokenizer, identical
    60-bit md5 window hash, identical floor-quantized basis points."""
    pos = f"""
      SELECT {id_col},
             unnest([('0x' || substring(
                        md5(array_to_string(toks[i:i+{k - 1}], ' ')),
                        1, 15))::BIGINT
                     FOR i IN range(1, len(toks) - {k - 2})]) AS h
      FROM (SELECT {id_col},
                   list_filter(string_split({text_col}, ' '), t -> t <> '')
                     AS toks
            FROM {table})
      WHERE len(toks) >= {k}"""
    return f"""
    WITH pos AS ({pos}),
    bench AS (SELECT DISTINCT h FROM pos WHERE {id_col} % {mod} = 0),
    train AS (SELECT * FROM pos WHERE {id_col} % {mod} <> 0)
    SELECT t.{id_col},
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN b.h IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             AS hit_windows,
           CAST(floor(SUM(CASE WHEN b.h IS NULL THEN 0 ELSE 1 END)
                      * 10000.0 / COUNT(*) + 0.5) AS BIGINT) AS hit_bp,
           CAST(SUM(CASE WHEN b.h IS NULL THEN 0 ELSE 1 END) > 0 AS INT)
             AS contaminated
    FROM train t LEFT JOIN bench b USING (h)
    GROUP BY t.{id_col}
    """


def _gopher_flag_cols(
    text_col: str, min_words: int = 50, max_words: int = 100_000
) -> dict[str, Column]:
    """The five Gopher document-level rules as integer-exact boolean
    columns over a tokenized text column named ``_toks`` (float-free —
    every ratio threshold is cross-multiplied to integer arithmetic so
    the flags are bit-reproducible across engines):

    * flag_wc     — word count in [min_words, max_words]
    * flag_mwl    — mean word length in [3, 10] chars
                    (3*n <= sum_len <= 10*n)
    * flag_symbol — symbol-to-word ratio ('#' and '...') <= 0.1
                    (10*(3*n_hash + n_ell3) <= 3*n, ellipses counted
                    as the undivided 3-char length delta)
    * flag_alpha  — >= 80 % of words contain an alphabetic character
                    (5*alpha_words >= 4*n)
    * flag_stop   — contains >= 2 distinct Gopher stop words
    """
    n = F.size("_toks")
    sum_len = F.aggregate(
        F.transform("_toks", F.length), F.lit(0), lambda a, x: a + x
    )
    n_hash = F.length(text_col) - F.length(F.replace(text_col, F.lit("#")))
    # length delta of stripping '...' = 3 * ellipsis count; kept
    # UNdivided so flag_symbol stays in integer arithmetic (the /3
    # form crosses a double compare): 10*(#+…) <= n becomes
    # 10*(3*n_hash + n_ell3) <= 3*n.
    n_ell3 = (
        F.length(text_col) - F.length(F.replace(text_col, F.lit("...")))
    )
    alpha = F.size(F.filter("_toks", lambda t: t.rlike("[a-zA-Z]")))
    stop_n = sum(
        (
            F.array_contains("_toks", w).cast("int")
            for w in GOPHER_STOPWORDS
        ),
        F.lit(0),
    )
    return {
        "n_words": n.cast("int"),
        "n_stop": stop_n.cast("int"),
        "flag_wc": ((n >= min_words) & (n <= max_words)).cast("int"),
        "flag_mwl": (
            (sum_len >= 3 * n) & (sum_len <= 10 * n)
        ).cast("int"),
        "flag_symbol": ((10 * (3 * n_hash + n_ell3) <= 3 * n)).cast("int"),
        "flag_alpha": ((5 * alpha >= 4 * n)).cast("int"),
        "flag_stop": (stop_n >= 2).cast("int"),
    }


def gopher_flags(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_words: int = 50, max_words: int = 100_000,
) -> DataFrame:
    """Per-document Gopher quality-rule flags (0/1 ints) plus pass_all.
    Pure row-local column arithmetic — zero shuffle, whole-stage codegen
    end to end; at 100 TB this is a single scan whose cost is the
    tokenizer. The tokenized array is staged through ONE projection so
    CollapseProject cannot re-inline the split per rule."""
    from mintpy_spark.functions.scalars import nonempty_tokens

    t = docs.select(
        F.col(id_col),
        F.col(text_col),
        nonempty_tokens(text_col).alias("_toks"),
    )
    flags = _gopher_flag_cols(text_col, min_words, max_words)
    out = t.select(F.col(id_col), *[c.alias(k) for k, c in flags.items()])
    rule_cols = [k for k in flags if k.startswith("flag_")]
    pass_all = F.lit(1)
    for k in rule_cols:
        pass_all = pass_all * F.col(k)
    return out.withColumn("pass_all", pass_all.cast("int"))


def gopher_flags_oracle_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    min_words: int = 50, max_words: int = 100_000,
) -> str:
    """DuckDB twin of gopher_flags — same tokenizer, same integer
    cross-multiplied thresholds."""
    stop_sum = " + ".join(
        f"CASE WHEN list_contains(toks, '{w}') THEN 1 ELSE 0 END"
        for w in GOPHER_STOPWORDS
    )
    return f"""
    WITH t AS (
      SELECT {id_col}, {text_col} AS txt,
             list_filter(string_split({text_col}, ' '), t -> t <> '') AS toks
      FROM {table}),
    s AS (
      SELECT {id_col},
             len(toks) AS n,
             COALESCE(list_sum(list_transform(toks, t -> len(t))), 0)
               AS sum_len,
             len(txt) - len(replace(txt, '#', '')) AS n_hash,
             len(txt) - len(replace(txt, '...', '')) AS n_ell3,
             len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]')))
               AS alpha,
             ({stop_sum}) AS stop_n
      FROM t)
    SELECT {id_col},
           CAST(n AS INT) AS n_words,
           CAST(stop_n AS INT) AS n_stop,
           CAST(n >= {min_words} AND n <= {max_words} AS INT) AS flag_wc,
           CAST(sum_len >= 3 * n AND sum_len <= 10 * n AS INT) AS flag_mwl,
           CAST(10 * (3 * n_hash + n_ell3) <= 3 * n AS INT) AS flag_symbol,
           CAST(5 * alpha >= 4 * n AS INT) AS flag_alpha,
           CAST(stop_n >= 2 AS INT) AS flag_stop,
           CAST(flag_wc * flag_mwl * flag_symbol * flag_alpha * flag_stop
                AS INT) AS pass_all
    FROM s
    """


def gopher_pass_by_source(
    docs: DataFrame, source_col: str = "source", text_col: str = "text",
    min_words: int = 50, max_words: int = 100_000,
) -> DataFrame:
    """Per-source Gopher pass rates — the curation decision table (which
    crawl sources survive filtering, and which rule rejects them). The
    flags are computed row-locally in the same scan (no join back to the
    corpus), so the whole plan is one scan + one partial+final hash agg
    on the source key; pass_bp is the exact-integer basis-point
    fraction."""
    from mintpy_spark.functions.scalars import nonempty_tokens

    t = docs.select(
        F.col(source_col),
        F.col(text_col),
        nonempty_tokens(text_col).alias("_toks"),
    )
    flags = _gopher_flag_cols(text_col, min_words, max_words)
    rule_cols = [k for k in flags if k.startswith("flag_")]
    row = t.select(
        F.col(source_col), *[flags[k].alias(k) for k in rule_cols]
    )
    pass_all = F.lit(1)
    for k in rule_cols:
        pass_all = pass_all * F.col(k)
    row = row.withColumn("pass_all", pass_all.cast("int"))
    sums = [F.sum(c).cast("long").alias(c) for c in (*rule_cols, "pass_all")]
    return (
        row.groupBy(source_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"), *sums)
        .withColumn(
            "pass_bp",
            F.floor(
                F.col("pass_all") * F.lit(10000.0) / F.col("n_docs")
                + F.lit(0.5)
            ).cast("long"),
        )
    )


def gopher_by_source_oracle_sql(
    table: str = "documents", source_col: str = "source",
    text_col: str = "text", min_words: int = 50, max_words: int = 100_000,
) -> str:
    """DuckDB twin of gopher_pass_by_source."""
    stop_sum = " + ".join(
        f"CASE WHEN list_contains(toks, '{w}') THEN 1 ELSE 0 END"
        for w in GOPHER_STOPWORDS
    )
    return f"""
    WITH t AS (
      SELECT {source_col} AS src, {text_col} AS txt,
             list_filter(string_split({text_col}, ' '), t -> t <> '') AS toks
      FROM {table}),
    s AS (
      SELECT src,
             len(toks) AS n,
             COALESCE(list_sum(list_transform(toks, t -> len(t))), 0)
               AS sum_len,
             len(txt) - len(replace(txt, '#', '')) AS n_hash,
             len(txt) - len(replace(txt, '...', '')) AS n_ell3,
             len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]')))
               AS alpha,
             ({stop_sum}) AS stop_n
      FROM t),
    f AS (
      SELECT src,
             CAST(n >= {min_words} AND n <= {max_words} AS INT) AS flag_wc,
             CAST(sum_len >= 3 * n AND sum_len <= 10 * n AS INT) AS flag_mwl,
             CAST(10 * (3 * n_hash + n_ell3) <= 3 * n AS INT) AS flag_symbol,
             CAST(5 * alpha >= 4 * n AS INT) AS flag_alpha,
             CAST(stop_n >= 2 AS INT) AS flag_stop
      FROM s)
    SELECT src AS {source_col},
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(flag_wc) AS BIGINT) AS flag_wc,
           CAST(SUM(flag_mwl) AS BIGINT) AS flag_mwl,
           CAST(SUM(flag_symbol) AS BIGINT) AS flag_symbol,
           CAST(SUM(flag_alpha) AS BIGINT) AS flag_alpha,
           CAST(SUM(flag_stop) AS BIGINT) AS flag_stop,
           CAST(SUM(flag_wc * flag_mwl * flag_symbol * flag_alpha
                    * flag_stop) AS BIGINT) AS pass_all,
           CAST(floor(SUM(flag_wc * flag_mwl * flag_symbol * flag_alpha
                          * flag_stop) * 10000.0 / COUNT(*) + 0.5)
                AS BIGINT) AS pass_bp
    FROM f GROUP BY src
    """
