"""Round-3 batch ccc: graph centrality and dedup-recall evaluation.

* ``graph_pagerank_bipartite`` — two Jacobi PageRank iterations over
  the customer-part co-purchase bipartite graph in fixed-point integer
  arithmetic (scale 10^12, integral ``div`` everywhere), so the ranks
  are fold-order independent and cross-engine exact — the same
  discipline as the integer-cents OLAP family. The iteration count is
  unrolled (two CTE layers), exactly how a bounded-round distributed
  PageRank runs: each round is one shuffle-on-node-id join, lineage
  checkpointed between rounds at production scale (see
  operators/dedup.dedup_components for the checkpoint pattern).
* ``dedup_lsh_recall_eval`` — the eval harness a pipeline runs before
  trusting MinHash-LSH dedup at 10^12 docs: candidate pairs from the
  production LSH path (operators/dedup.minhash_near_dups) scored
  against exact same-source unigram-Jaccard ground truth; reports
  hit/miss counts and recall/precision in rounded basis points. The
  ground truth is only computable at small scale — which is precisely
  the point: measure recall on a sampled block, then deploy the
  banded path corpus-wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.operators import dedup as D
from mintpy_spark.plans.cache import persist_slot
from mintpy_spark.queries import _q, load

# One-slot caches for the recall eval's pair tables — each feeds its
# own count AND the hit join; unpersisted, both rebuilt twice (the
# audited plan scanned documents 9 times).
_TRUTH_SLOT: list = []
_PRED_SLOT: list = []
_PR_EDGE_SLOT: list = []

_SCALE = 10**12


@_q(
    "graph_pagerank_bipartite",
    f"""
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    dc AS (SELECT c, COUNT(*) AS dcnt FROM e GROUP BY 1),
    dp AS (SELECT p, COUNT(*) AS dpnt FROM e GROUP BY 1),
    nn AS (
      SELECT (SELECT COUNT(*) FROM dc) + (SELECT COUNT(*) FROM dp) AS n
    ),
    consts AS (
      SELECT n, {_SCALE} // n AS pr0, (15 * {_SCALE}) // (100 * n) AS base
      FROM nn
    ),
    c1 AS (
      SELECT e.c,
             k.base + (85 * SUM(k.pr0 // dp.dpnt)) // 100 AS pr
      FROM e JOIN dp ON e.p = dp.p CROSS JOIN consts k
      GROUP BY e.c, k.base
    ),
    p2 AS (
      SELECT e.p,
             k.base + (85 * SUM(c1.pr // dc.dcnt)) // 100 AS pr
      FROM e JOIN dc ON e.c = dc.c JOIN c1 ON e.c = c1.c
      CROSS JOIN consts k
      GROUP BY e.p, k.base
    )
    SELECT p AS p_partkey, CAST(pr AS BIGINT) AS pagerank_fp
    FROM p2
    """,
)
def graph_pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-side PageRank after two unrolled Jacobi rounds (damping
    0.85) over distinct (customer, part) purchase edges. Plan: one
    distinct edge agg shuffled on (c, p); both degree tables are re-aggs
    of it; the scalar node-count/base constants ride a broadcast 1-row
    crossJoin (never a driver collect); each round is a hash join of
    the edge list with the previous round's rank keyed on the sender
    node. Integer fixed-point keeps every engine and every fold order
    on identical values."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    e = persist_slot(e, _PR_EDGE_SLOT)
    dc = e.groupBy("c").agg(F.count(F.lit(1)).alias("dcnt"))
    dp = e.groupBy("p").agg(F.count(F.lit(1)).alias("dpnt"))
    nn = dc.agg(F.count(F.lit(1)).alias("n_c")).crossJoin(
        dp.agg(F.count(F.lit(1)).alias("n_p"))
    ).selectExpr(
        f"{_SCALE} div (n_c + n_p) AS pr0",
        f"(15 * {_SCALE}) div (100 * (n_c + n_p)) AS base",
    )
    c1 = (
        e.join(dp, "p")
        .crossJoin(F.broadcast(nn))
        .selectExpr("c", "base", "pr0 div dpnt AS contrib")
        .groupBy("c", "base")
        .agg(F.sum("contrib").alias("s"))
        .selectExpr("c", "base + (85 * s) div 100 AS pr")
    )
    p2 = (
        e.join(dc, "c")
        .join(c1, "c")
        .selectExpr("p", "pr div dcnt AS contrib")
        .groupBy("p")
        .agg(F.sum("contrib").alias("s"))
        .crossJoin(F.broadcast(nn.select("base")))
        .selectExpr(
            "p AS p_partkey",
            "CAST(base + (85 * s) div 100 AS LONG) AS pagerank_fp",
        )
    )
    return p2


_TRUTH_CTE = """
    t AS (
      SELECT doc_id, source,
             list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))
               AS toks
      FROM documents
    ),
    truth AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
            / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
            >= 0.5
    )
"""


@_q(
    "dedup_lsh_recall_eval",
    f"""
    WITH {_TRUTH_CTE},
    ds AS (SELECT doc_id, source FROM documents),
    pred AS (
      SELECT p.doc_a, p.doc_b
      FROM ({D.minhash_oracle_sql(threshold=0.5)}) p
      JOIN ds a ON p.doc_a = a.doc_id
      JOIN ds b ON p.doc_b = b.doc_id
      WHERE a.source = b.source
    ),
    hit AS (
      SELECT COUNT(*) AS n FROM truth t
      JOIN pred p ON t.doc_a = p.doc_a AND t.doc_b = p.doc_b
    )
    SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
           CAST((SELECT COUNT(*) FROM pred) AS BIGINT) AS n_pred,
           CAST(hit.n AS BIGINT) AS n_hit,
           CAST((20000 * hit.n + (SELECT COUNT(*) FROM truth))
                // (2 * (SELECT COUNT(*) FROM truth)) AS BIGINT) AS recall_bp,
           CAST((20000 * hit.n + (SELECT COUNT(*) FROM pred))
                // (2 * (SELECT COUNT(*) FROM pred)) AS BIGINT) AS precision_bp
    FROM hit
    """,
)
def dedup_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/precision of the production MinHash-LSH near-dup path
    against exact same-source Jaccard >= 0.5 ground truth (rounded
    basis points, integer-exact). The predicted side IS
    minhash_near_dups — same signatures, bands, and verify threshold
    as ``dedup_minhash_lsh`` — restricted to same-source pairs so both
    sides range over the identical pair space. Truth is the quadratic
    verification formulation (block-bounded, small-scale only; see
    VERIFICATION_ONLY in queries.py for the policy)."""
    d = load(spark, sf_dir, "documents")
    toks = F.array_distinct(F.filter(F.split("text", " "), lambda x: x != ""))
    t = d.select("doc_id", "source", toks.alias("toks"))
    a, b = t.alias("a"), t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.col("a.toks")) + F.size(F.col("b.toks")) - inter
    truth = (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(inter.cast("double") / union >= 0.5)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    truth = persist_slot(truth, _TRUTH_SLOT)
    src = d.select("doc_id", "source")
    pred = (
        D.minhash_near_dups(d, threshold=0.5)
        .join(src.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("source", "src_a")
        .join(src.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .where(F.col("src_a") == F.col("source"))
        .select("doc_a", "doc_b")
    )
    pred = persist_slot(pred, _PRED_SLOT)
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    n_pred = pred.agg(F.count(F.lit(1)).alias("n_pred"))
    n_hit = truth.join(pred, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    return (
        n_hit.crossJoin(F.broadcast(n_truth))
        .crossJoin(F.broadcast(n_pred))
        .selectExpr(
            "n_truth", "n_pred", "n_hit",
            "CAST((20000 * n_hit + n_truth) div (2 * n_truth) AS LONG)"
            " AS recall_bp",
            "CAST((20000 * n_hit + n_pred) div (2 * n_pred) AS LONG)"
            " AS precision_bp",
        )
    )
