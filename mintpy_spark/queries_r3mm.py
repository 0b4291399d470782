"""Round-3 batch mm: retrieval, rank-shift drift, and mix impurity.

- ``index_search_topk``: conjunctive (AND) term search over the
  inverted index with integer tf ranking — the retrieval read path on
  top of index_postings_stats' build path.
- ``token_rank_shift_weekly``: heavy-hitter drift as RANK movement of
  the top tokens between consecutive weeks — catches churn in the head
  of the distribution that mass-based drift (TVD/KS) dilutes.
- ``user_type_mix_gini``: Gini impurity of each user's event-type mix,
  cross-multiplied to exact integers ((n^2 - sum c_t^2) in bp over
  n^2) — entropy would need ln(), which has no cross-engine parity
  guarantee; impurity is the rational-arithmetic twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

_TERMS = ("data", "merge")


@_q(
    "index_search_topk",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM tok WHERE term IN ('{_TERMS[0]}', '{_TERMS[1]}')
      GROUP BY 1, 2
    ), hits AS (
      SELECT doc_id,
             CAST(SUM(tf) AS BIGINT) AS score,
             COUNT(*) AS n_terms
      FROM tf GROUP BY 1 HAVING COUNT(*) = 2
    )
    SELECT doc_id, score, n_terms
    FROM hits ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def index_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive search: documents containing BOTH query terms, ranked
    by total term frequency (integer, doc_id tie-break). The term filter
    lands BEFORE the explode aggregate, so postings are built only for
    the query terms — the read-path plan, not an index rebuild."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).where(F.col("term").isin(*_TERMS))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    hits = (
        tf.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("score"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .where(F.col("n_terms") == 2)
    )
    return hits.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


@_q(
    "token_rank_shift_weekly",
    """
    WITH tok AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk,
             event_type AS term, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), r AS (
      SELECT wk, term, n,
             row_number() OVER (PARTITION BY wk ORDER BY n DESC, term) AS rnk
      FROM tok
    )
    SELECT a.wk, a.term,
           a.rnk AS rank_now, b.rnk AS rank_prev,
           CAST(b.rnk - a.rnk AS BIGINT) AS shift
    FROM r a JOIN r b ON b.wk = a.wk - 1 AND b.term = a.term
    """,
)
def token_rank_shift_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-of-distribution drift: each term's frequency rank this week
    vs last (positive shift = climbing). Rank tables are |terms| rows
    per week — the self-join never touches raw volume."""
    ev = load(spark, sf_dir, "events")
    tok = ev.groupBy(
        F.expr("datediff(to_date(ts), DATE '1970-01-01') div 7").alias("wk"),
        F.col("event_type").alias("term"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("wk").orderBy(F.desc("n"), F.asc("term"))
    r = tok.withColumn("rnk", F.row_number().over(w))
    a, b = r.alias("a"), r.alias("b")
    return a.join(
        b,
        (F.col("b.wk") == F.col("a.wk") - 1) & (F.col("b.term") == F.col("a.term")),
    ).select(
        F.col("a.wk").alias("wk"),
        F.col("a.term").alias("term"),
        F.col("a.rnk").alias("rank_now"),
        F.col("b.rnk").alias("rank_prev"),
        (F.col("b.rnk") - F.col("a.rnk")).cast("long").alias("shift"),
    )


@_q(
    "user_type_mix_gini",
    """
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS ct
      FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
    ), u AS (
      SELECT user_id,
             CAST(SUM(ct) AS BIGINT) AS n,
             CAST(SUM(ct * ct) AS BIGINT) AS ss,
             CAST(COUNT(*) AS BIGINT) AS n_types
      FROM c GROUP BY 1
    )
    SELECT user_id, n, n_types,
           CAST((n * n - ss) * 10000 // (n * n) AS BIGINT) AS gini_bp
    FROM u
    """,
)
def user_type_mix_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini impurity of the per-user event-type mix in basis points —
    pure integer arithmetic (1 - sum p^2 cross-multiplied by n^2): 0 =
    single-type user, ~8000 = uniform over 5 types. The rational twin of
    mix entropy (ln() is not cross-engine parity-safe)."""
    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("ct")
    )
    u = c.groupBy("user_id").agg(
        F.sum("ct").cast("long").alias("n"),
        F.sum(F.col("ct") * F.col("ct")).cast("long").alias("ss"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    return u.select(
        "user_id",
        "n",
        "n_types",
        F.expr("CAST((n * n - ss) * 10000 div (n * n) AS BIGINT)").alias(
            "gini_bp"
        ),
    )
