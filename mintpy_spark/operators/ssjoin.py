"""Exact set-similarity self-join with prefix filtering — the AllPairs /
PPJoin family (Bayardo, Ma, Srikant 2007 "Scaling Up All Pairs
Similarity Search"; Xiao et al. 2008 PPJoin). The EXACT complement to
the banded-LSH paths in operators/dedup.py: no false negatives, no
probability knob — every pair with Jaccard >= t is returned, yet the
candidate join touches only a small prefix of each set instead of
all-pairs.

The filter: order every set by one global token order (rarity
ascending — document frequency, ties by hash), index only the first
``|x| - ceil(t*|x|) + 1`` elements of each set. Any pair with
J(x, y) >= t MUST collide on a token lying in BOTH prefixes: if all
common tokens sat in the suffixes, |x ∩ y| <= ceil(t*|x|) - 1 <
ceil(t*max(|x|,|y|)) <= |x ∩ y| — contradiction. Rarity ordering makes
the surviving prefix buckets small (rare tokens pair few documents).

Scale shape at 10^12 docs: shingle sets build row-locally; the df table
is vocab-sized (shuffle on the 60-bit hash, uniform by construction);
the candidate join is clustered on prefix-token hash with fan-out
bounded by per-token document frequency — the hot-token quadratic risk
is exactly what rarity-first prefixes minimize, and a df cap on PREFIX
tokens is unsound (it breaks exactness), so the length filter
(t*max <= min, integer cross-multiplied) is the skew relief. The
verify stage moves each candidate pair's two sorted arrays once.

Thresholds are exact rationals (t = t_num/t_den) so every comparison is
integer cross-multiplication — no float threshold ambiguity between
engines.

Reference analog: none in MintPy (dedup extends the engine per the
build brief); this is the verification-grade exact tier that the
approximate MinHash/SimHash paths are audited against at bounded scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mintpy_spark.functions.scalars import nonempty_tokens, portable_hash60

# One-slot persisted shingle-set cache (plans/cache.py discipline).
_SET_SLOT: list = []


def shingle_hash_sets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id_col, sh): per document the DISTINCT n-token shingle hash set
    (60-bit portable md5 hashes), built entirely row-locally."""
    t = docs.select(
        F.col(id_col), nonempty_tokens(text_col).alias("_toks")
    ).where(F.size("_toks") >= n)
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("_toks") - n),
            lambda i: portable_hash60(
                F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, n))
            ),
        )
    )
    return t.select(F.col(id_col), sh.alias("sh"))


def _ceil_mul(n: Column, t_num: int, t_den: int) -> Column:
    """ceil(t_num * n / t_den) exactly: the double division is exact for
    set sizes far below 2^52, and floor of it is the integer ceil of the
    rational (Column has no integer // operator)."""
    return F.floor((n * t_num + (t_den - 1)) / t_den).cast("int")


def ssjoin_jaccard(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    t_num: int = 4,
    t_den: int = 5,
) -> DataFrame:
    """(id_a, id_b, inter, uni): every document pair with n-shingle
    Jaccard >= t_num/t_den — EXACT (prefix filtering loses nothing).
    inter/uni are the exact intersection/union sizes, so the caller can
    re-derive the similarity at any precision."""
    sets = shingle_hash_sets(docs, id_col, text_col, n=n)
    # cache: the sets table feeds the df census, the prefix explode and
    # the verify join — one computation, three consumers.
    from mintpy_spark.plans.cache import persist_slot

    sets = persist_slot(
        sets.withColumn("n", F.size("sh").cast("long")), _SET_SLOT
    )

    tok = sets.select(F.col(id_col), F.explode("sh").alias("h"))
    dfreq = tok.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    # global rarity order: (df, h) packed into one orderable struct;
    # sort_array on array<struct> is lexicographic.
    ordered = (
        tok.join(dfreq, "h")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("df", "h"))).alias("os"))
    )
    pref_len = F.size("os") - _ceil_mul(F.size("os"), t_num, t_den) + 1
    prefix = ordered.select(
        F.col(id_col),
        F.size("os").cast("long").alias("n"),
        F.explode(F.slice("os", 1, pref_len)).alias("p"),
    ).select(id_col, "n", F.col("p.h").alias("h"))

    a = prefix.select(
        F.col("h"), F.col(id_col).alias("id_a"), F.col("n").alias("na")
    )
    b = prefix.select(
        F.col("h"), F.col(id_col).alias("id_b"), F.col("n").alias("nb")
    )
    cand = (
        a.join(b, "h")
        .where(
            (F.col("id_a") < F.col("id_b"))
            # length filter: J >= t forces t*max(|a|,|b|) <= min(|a|,|b|)
            & (
                F.least("na", "nb") * t_den
                >= F.greatest("na", "nb") * t_num
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sets.select(
        F.col(id_col).alias("id_a"), F.col("sh").alias("sa"),
        F.col("n").alias("na"),
    )
    sb = sets.select(
        F.col(id_col).alias("id_b"), F.col("sh").alias("sb"),
        F.col("n").alias("nb"),
    )
    v = cand.join(sa, "id_a").join(sb, "id_b")
    inter = F.size(F.array_intersect("sa", "sb")).cast("long")
    out = v.select(
        "id_a",
        "id_b",
        inter.alias("inter"),
        (F.col("na") + F.col("nb") - inter).alias("uni"),
    )
    return out.where(F.col("inter") * t_den >= F.col("uni") * t_num)


def ssjoin_oracle_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, t_num: int = 4, t_den: int = 5,
) -> str:
    """DuckDB twin: the INDEPENDENT all-pairs formulation (no prefix
    filter at all) — agreement proves the filter loses no pair."""
    return f"""
    WITH wt AS (
      SELECT {id_col},
             list_filter(string_split({text_col}, ' '), t -> t <> '') AS toks
      FROM {table}),
    s AS (
      SELECT {id_col},
             list_distinct([('0x' || substring(
                 md5(array_to_string(toks[i:i+{n - 1}], ' ')), 1, 15))::BIGINT
               FOR i IN range(1, len(toks) - {n - 2})]) AS sh
      FROM wt WHERE len(toks) >= {n}),
    p AS (
      SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
             CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
             CAST(len(a.sh) + len(b.sh)
                  - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS uni
      FROM s a JOIN s b ON a.{id_col} < b.{id_col})
    SELECT id_a, id_b, inter, uni
    FROM p WHERE inter * {t_den} >= uni * {t_num}
    """
