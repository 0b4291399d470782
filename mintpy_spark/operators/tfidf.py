"""TF-IDF term scoring over a document corpus (inverted-index shape).

The canonical "what characterizes this slice of the corpus" primitive of
an LLM-data pipeline: term frequency per group × inverse document
frequency across the corpus (public IR convention, Spärck Jones 1972).
Used for topic drift audits, source fingerprinting, and building
keep/drop keyword filters at corpus scale.

No MintPy analog (text is the graft payload, not the reference's
domain); the closest reference shape is the per-epoch aggregate keyed by
a secondary dimension (`temporal_average` per date, stats.py) — here the
secondary dimension is the term and the aggregate is a count.

Scale shape — this is deliberately the inverted-index plan:

- the token explode (~10^2 rows per doc, the one row-multiplying step)
  runs ONCE: it is aggregated to the per-document posting list
  (group, doc, term, tf_doc) with map-side partial combine and persisted
  through a one-slot cache, and BOTH consumers (tf and df) are cheap
  re-aggregations of that posting list — the two-branch form that
  re-explodes the corpus per branch doubles the most expensive stage at
  100 TB;
- df joins tf on ``term`` — vocabulary-sized (≪ corpus; Heaps' law), and
  Zipf skew on hot terms is agg-side (partials), not join-side, so no
  salting is needed;
- the corpus size N is a 1-row broadcast (the scalar-broadcast idiom
  used across this repo, e.g. operators/stats.py);
- top-k per group is one row_number window over the (group, term)
  aggregate — tiny relative to the corpus.

The float op sequence (ln(N/df), × tf) consumes exact integers, so
scores — and therefore the top-k cut — reproduce bit-for-bit across
engines; exact score ties break on the term string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# One-slot persisted posting-list cache (plans/cache.py discipline).
_POSTING_SLOT: list = []
# One-slot persisted bigram-vocabulary cache (pmi_top_pairs).
_PAIR_SLOT: list = []


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group: str = "source",
    k: int = 3,
) -> DataFrame:
    """(group, rank, term, tf, df, score): the ``k`` highest-TF-IDF terms
    per group.

    tf = occurrences of term in the group's concatenated text (raw
    count, whitespace tokens, empty tokens dropped — the one tokenizer,
    functions/scalars.nonempty_tokens); df = number of DISTINCT
    documents corpus-wide containing the term (countDistinct — exact
    even if ids repeat across groups, and NULL ids are excluded, both
    matching the SQL COUNT(DISTINCT doc_id) convention); N = total
    documents in the corpus (including empty ones — a stable
    denominator). score = tf · ln(N / df); corpus-ubiquitous terms
    (df = N, score exactly 0) are EXCLUDED before ranking — a group
    with fewer than k positive-score terms returns fewer than k rows
    rather than padding the "most characteristic" list with
    stopword-class terms. Ordering: score DESC, term ASC (deterministic
    under exact-tie)."""
    from mintpy_spark.functions.scalars import nonempty_tokens
    from mintpy_spark.plans.cache import persist_slot
    toks = docs.select(
        group,
        id_col,
        F.explode(nonempty_tokens(text_col)).alias("term"),
    )
    n_docs = docs.agg(F.count("*").alias("_n"))
    # the posting list: one row per (doc, term) — the single pass over
    # the token explosion; tf and df are re-aggregations of it
    posting = persist_slot(
        toks.groupBy(group, id_col, "term").agg(F.count("*").alias("tf_doc")),
        _POSTING_SLOT,
    )
    tf = posting.groupBy(group, "term").agg(F.sum("tf_doc").alias("tf"))
    # distinct documents per term from the posting list (NOT a row
    # count: ids repeated across groups or NULL ids must not inflate df)
    df_ = posting.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        # df = N -> score exactly 0: not characteristic, exclude BEFORE
        # ranking (integer comparison, no float-zero ambiguity)
        .where(F.col("df") < F.col("_n"))
        .withColumn("score", F.col("tf") * F.log(F.col("_n") / F.col("df")))
    )
    w = Window.partitionBy(group).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(group, "rank", "term", "tf", "df",
                F.round("score", 6).alias("score"))
    )


def unigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, logprob): mean unigram log-probability of each
    document under the corpus's own unigram model — the perplexity-proxy
    quality filter of an LLM-data pipeline (docs full of corpus-rare
    tokens score low: boilerplate noise, encoding damage, wrong-language
    fragments; public n-gram-LM filtering convention, e.g. CCNet).

    p(term) = corpus count(term) / total corpus tokens;
    logprob  = mean over the doc's tokens of ln p(term).

    Exactness discipline: ln p is an identical double on every engine
    (exact integer count / exact integer total), but a float MEAN over a
    doc's tokens is summation-order-sensitive — so each token's ln p is
    quantized to integer micro-nats (floor(x·1e6 + 0.5), same fixed-point
    recipe as operators/anomaly.quantize_fixed) and summed exactly; the
    single final division is a fixed op sequence. Empty docs are excluded
    (no tokens to score).

    Scale shape: the corpus frequency table is vocabulary-sized (Heaps'
    law) — it broadcasts; the token stream joins it map-side, then one
    hash agg per doc. Zipf-hot terms skew the FREQUENCY agg, which is
    partial-combined map-side, not the join."""
    from mintpy_spark.functions.scalars import nonempty_tokens

    toks = docs.select(
        id_col, F.explode(nonempty_tokens(text_col)).alias("term")
    )
    freq = toks.groupBy("term").agg(F.count("*").alias("c"))
    # total tokens from the vocabulary-sized freq table, NOT a third
    # pass over the token explosion
    total = freq.agg(F.sum("c").alias("_t"))
    lp = F.log(F.col("c").cast("double") / F.col("_t").cast("double"))
    # integer micro-nats: exact summation regardless of partitioning
    lp_q = F.floor(lp * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    scored = (
        toks.join(F.broadcast(freq), "term")
        .crossJoin(F.broadcast(total))
        .select(id_col, lp_q.alias("_lpq"))
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"), F.sum("_lpq").alias("_s")
    )
    score = F.col("_s").cast("double") / (
        F.col("n_tokens").cast("double") * F.lit(1000000.0)
    )
    return agg.select(id_col, "n_tokens", F.round(score, 4).alias("logprob"))


def pmi_top_pairs(
    docs: DataFrame, text_col: str = "text", top_k: int = 20,
    min_pair_count: int = 5,
) -> DataFrame:
    """Collocation extraction: top-k adjacent-token bigrams by PMI
    (pointwise mutual information, Church & Hanks 1990) — the phrase
    mining step a corpus pipeline runs to find multiword expressions
    worth single-token treatment.

    Ranking is INTEGER-exact: since PMI = log(c_ab * N_u^2 /
    (N_b * c_a * c_b)) and (N_u, N_b) are corpus constants, ranking by
    PMI is ranking by c_ab / (c_a * c_b). The engine ranks on
    score = (c_ab * 10^12) div (c_a * c_b) — integer division, exact in
    both Spark (`div`) and DuckDB (`//`), no libm log at the ranking
    boundary — with (tok_a, tok_b) as the deterministic tie-break.
    (c_ab <= 10^6 even at 10^12 docs only if capped; headroom: the
    int64 limit allows c_ab up to ~9.2e6 at this quantizer — rescale
    the constant per corpus size; min_pair_count keeps the classic
    PMI rare-pair artifact bounded.)

    Plan shape: ONE bigram explode (row-local slice/zip of the token
    array) -> hash agg to the bigram vocabulary; unigram counts are a
    re-aggregation of the same exploded rows; both joins are
    vocabulary-sized (Heaps' law) and broadcast-eligible. Final top-k
    is a single ORDER BY ... LIMIT over the (tiny) filtered pair
    vocabulary.
    """
    from mintpy_spark.functions.scalars import nonempty_tokens

    t = docs.select(nonempty_tokens(text_col).alias("_toks")).where(
        F.size("_toks") >= 2
    )
    pairs = t.select(
        F.explode(
            F.zip_with(
                F.slice("_toks", 1, F.size("_toks") - 1),
                F.slice("_toks", 2, F.size("_toks") - 1),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("tok_a"), F.col("p.b").alias("tok_b"))
    from mintpy_spark.plans.cache import persist_slot

    # ONE corpus explode: the bigram vocabulary is persisted (one-slot
    # cache, plans/cache.py discipline) and every downstream consumer —
    # the pair filter and BOTH unigram re-aggregations — reads the
    # vocabulary-sized table, never the corpus again.
    pair_c = persist_slot(
        pairs.groupBy("tok_a", "tok_b").agg(
            F.count(F.lit(1)).alias("c_ab")
        ),
        _PAIR_SLOT,
    )
    # NOTE: unigram counts are *positional* counts over the bigram
    # stream (each interior token counted twice, ends once), aggregated
    # from the pair vocabulary rather than the corpus — the convention
    # is applied identically in the oracle, and constants cancel in the
    # ranking.
    uni = (
        pair_c.select(F.col("tok_a").alias("tok"), "c_ab")
        .unionAll(pair_c.select(F.col("tok_b").alias("tok"), "c_ab"))
        .groupBy("tok")
        .agg(F.sum("c_ab").alias("cu"))
    )
    j = (
        pair_c.where(F.col("c_ab") >= min_pair_count)
        .join(F.broadcast(uni.withColumnRenamed("tok", "tok_a")
                          .withColumnRenamed("cu", "c_a")), "tok_a")
        .join(F.broadcast(uni.withColumnRenamed("tok", "tok_b")
                          .withColumnRenamed("cu", "c_b")), "tok_b")
    )
    score = F.expr("(c_ab * 1000000000000) div (c_a * c_b)")
    return (
        j.select(
            "tok_a", "tok_b",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.col("c_a").cast("long").alias("c_a"),
            F.col("c_b").cast("long").alias("c_b"),
            score.cast("long").alias("score"),
        )
        .orderBy(F.desc("score"), "tok_a", "tok_b")
        .limit(top_k)
    )


def bigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bigrams, logprob): mean add-one-smoothed bigram
    log-probability of each document under the corpus's own bigram
    model — the second-order twin of unigram_logprob:

        p(w2 | w1) = (count(w1 w2) + 1) / (count(w1) + V)

    with V the corpus unigram vocabulary (standard Laplace smoothing,
    e.g. Jurafsky & Martin ch. 3). Catches locally-fluent-but-scrambled
    text that unigram scoring cannot (every token common, order junk).

    Same exactness discipline as unigram_logprob: every ln is a
    deterministic double over exact integers, quantized to micro-nats
    before the per-doc summation.

    Scale shape: the bigram list is built ROW-LOCALLY (one transform
    over the staged token array — no self-join of the token stream),
    then exploded once. The unigram table broadcasts (vocabulary-
    sized); the bigram-frequency join is key-keyed and left to AQE —
    the bigram vocabulary outgrows a broadcast at corpus scale, and
    Zipf-hot bigrams are exactly the skewed keys AQE splits. Docs with
    fewer than 2 tokens are excluded."""
    from mintpy_spark.functions.scalars import nonempty_tokens

    staged = docs.select(
        id_col, nonempty_tokens(text_col).alias("_toks")
    ).where(F.size("_toks") >= 2)
    k = F.size("_toks") - 1
    bigrams = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(
            " ", F.element_at("_toks", i + 1), F.element_at("_toks", i + 2)
        ),
    )
    bg = staged.select(id_col, F.explode(bigrams).alias("bg")).withColumn(
        "w1", F.substring_index("bg", " ", 1)
    )
    toks = docs.select(F.explode(nonempty_tokens(text_col)).alias("term"))
    uni = toks.groupBy("term").agg(F.count("*").alias("c"))
    v = uni.agg(F.count("*").alias("_v"))
    fbg = bg.groupBy("bg").agg(F.count("*").alias("cbg"))
    lp = F.log(
        (F.col("cbg") + F.lit(1.0))
        / (F.col("c").cast("double") + F.col("_v").cast("double"))
    )
    lp_q = F.floor(lp * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    scored = (
        bg.join(fbg, "bg")
        .join(F.broadcast(uni), F.col("w1") == F.col("term"))
        .crossJoin(F.broadcast(v))
        .select(id_col, lp_q.alias("_lpq"))
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"), F.sum("_lpq").alias("_s")
    )
    return agg.select(
        id_col,
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.round(
            F.col("_s").cast("double")
            / (F.col("n_bigrams").cast("double") * F.lit(1000000.0)),
            4,
        ).alias("logprob"),
    )
