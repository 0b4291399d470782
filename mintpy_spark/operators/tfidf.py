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


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(rank, id, score_micro, n_terms): BM25-ranked top-k documents for a
    bag of query terms (Robertson/Sparck-Jones probabilistic ranking, the
    Lucene/Okapi variant with the +1 idf floor) — the ranked companion of
    the conjunctive index search (queries_r3o.index_search_topk), and the
    retrieval analog of the reference's "pick the best epoch by a scored
    criterion" pattern (timeseries_rms.py argmin selection).

        idf(t)   = ln((N - df + 0.5) / (df + 0.5) + 1)
        tfn(d,t) = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
        score(d) = sum_t idf(t) * tfn(d,t)

    Exactness discipline: idf and tfn are fixed-op-order doubles over
    exact integers (tf, df, dl, N) and the corpus-constant avgdl (one
    double division); each per-(doc,term) product is quantized to integer
    micro-units (floor(x*1e6 + 0.5)) BEFORE the per-doc sum, so the final
    score is an exact int64 under any partitioning, and ranking ties
    break on the id column.

    Scale shape: the token explosion is filtered to the query terms AT
    the explode (predicate on the generator output — the posting list for
    |terms| terms, not the corpus vocabulary); df and avgdl are 1-row /
    |terms|-row broadcasts; the final top-k is orderBy+limit
    (TakeOrdered — per-partition heaps then one |k| merge, never a global
    sort), with row_number assigned on the k survivors only."""
    from mintpy_spark.functions.scalars import nonempty_tokens

    kp1 = float(k1) + 1.0
    one_minus_b = 1.0 - float(b)
    staged = docs.select(
        id_col, nonempty_tokens(text_col).alias("_toks")
    ).withColumn("dl", F.size("_toks").cast("long"))
    stats = staged.agg(
        F.count("*").alias("_n"),
        (F.sum("dl") / F.count("*").cast("double")).alias("avgdl"),
    )
    tf = (
        staged.select(id_col, "dl", F.explode("_toks").alias("term"))
        .where(F.col("term").isin(list(terms)))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("_n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfn = (F.col("tf") * F.lit(kp1)) / (
        F.col("tf")
        + F.lit(float(k1))
        * (F.lit(one_minus_b) + F.lit(float(b)) * F.col("dl") / F.col("avgdl"))
    )
    sq = F.floor(idf * tfn * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .select(id_col, sq.alias("_sq"))
        .groupBy(id_col)
        .agg(F.sum("_sq").alias("score_micro"), F.count("*").alias("n_terms"))
    )
    top = scored.orderBy(F.desc("score_micro"), F.asc(id_col)).limit(top_k)
    w = Window.orderBy(F.desc("score_micro"), F.asc(id_col))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        id_col,
        "score_micro",
        "n_terms",
    )


def bm25_oracle_sql(
    terms: list[str], top_k: int = 10, k1: float = 1.2, b: float = 0.75
) -> str:
    """DuckDB twin of bm25_topk over the `documents` view — identical
    tokenizer, identical fixed op order, identical micro-quantization."""
    tlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    kp1 = float(k1) + 1.0
    omb = 1.0 - float(b)
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> t <> '') AS t
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n,
             SUM(len(t)) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM toks
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf, ANY_VALUE(dl) AS dl
      FROM (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, UNNEST(t) AS term
            FROM toks)
      WHERE term IN ({tlist})
      GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             CAST(SUM(CAST(FLOOR(
               LN((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
               * ((tf.tf * {kp1!r}) /
                  (tf.tf + {float(k1)!r}
                   * ({omb!r} + {float(b)!r} * tf.dl / stats.avgdl)))
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS score_micro,
             COUNT(*) AS n_terms
      FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
                AS BIGINT) AS rank,
           doc_id, score_micro, n_terms
    FROM (SELECT * FROM scored
          ORDER BY score_micro DESC, doc_id LIMIT {int(top_k)})
    """


def adjacent_pair_census(
    docs: DataFrame,
    group: str = "lang",
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """(group, rnk, w1, w2, cnt): the top-k most frequent ADJACENT token
    pairs per group — one census round of byte-pair/merge-style tokenizer
    training (Sennrich 2016: each BPE merge step is exactly "count all
    adjacent symbol pairs, take the argmax"). Per-language census so a
    multilingual corpus trains per-lang merge tables.

    Pure integer counts; ranking ties break (cnt DESC, w1, w2) so the
    census is deterministic. Scale shape: pairs are built ROW-LOCALLY
    from the staged token array (transform over sequence — no token-
    stream self-join, same move as bigram_logprob), then ONE hash agg
    with map-side partials; the rank window runs per group over the
    pair-vocabulary rows (Heaps-bounded), not the corpus."""
    from mintpy_spark.functions.scalars import nonempty_tokens

    staged = docs.select(
        group, nonempty_tokens(text_col).alias("_toks")
    ).where(F.size("_toks") >= 2)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("_toks") - 1),
        lambda i: F.struct(
            F.element_at("_toks", i).alias("w1"),
            F.element_at("_toks", i + 1).alias("w2"),
        ),
    )
    counted = (
        staged.select(group, F.explode(pairs).alias("_p"))
        .select(group, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
        .groupBy(group, "w1", "w2")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(group).orderBy(
        F.desc("cnt"), F.asc("w1"), F.asc("w2")
    )
    return (
        counted.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= top_k)
        .select(group, "rnk", "w1", "w2", "cnt")
    )
