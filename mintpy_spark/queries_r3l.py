"""Round-3 additions, batch l: quality-aware dedup representative
selection — the final decision of a fuzzy-dedup pipeline (which document
of each near-dup cluster survives into the training shard), composing
the transitive-component clustering with the Gopher quality flags."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.operators import curation as C
from mintpy_spark.operators import dedup as D
from mintpy_spark.queries import _q, load

_KEEP_THRESHOLD = 0.875
_KEEP_ITER = 4


@_q(
    "dedup_keeper_best_quality",
    f"""
    WITH comp AS MATERIALIZED ({D.components_oracle_sql(
        f"SELECT doc_a, doc_b FROM ({D.minhash_oracle_sql(threshold=_KEEP_THRESHOLD)})",
        iterations=_KEEP_ITER,
    )}),
    flags AS MATERIALIZED ({C.gopher_flags_oracle_sql()}),
    j AS (
      SELECT comp.component, comp.doc_id, flags.pass_all, flags.n_words,
             ROW_NUMBER() OVER (
               PARTITION BY comp.component
               ORDER BY flags.pass_all DESC, flags.n_words DESC,
                        comp.doc_id ASC) AS rk,
             COUNT(*) OVER (PARTITION BY comp.component) AS n_members
      FROM comp JOIN flags USING (doc_id))
    SELECT component,
           CAST(n_members AS BIGINT) AS n_members,
           doc_id AS keeper,
           CAST(pass_all AS INT) AS keeper_pass_all,
           CAST(n_words AS INT)  AS keeper_n_words
    FROM j WHERE rk = 1
    """,
)
def dedup_keeper_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware representative per near-dup cluster: transitive
    MinHash components (dedup_components, 4 unrolled label-propagation
    rounds) joined with the Gopher rule flags; the keeper is the member
    ranked by (pass_all DESC, n_words DESC, doc_id ASC) — "keep the
    highest-quality, then longest, then first" — the decision a fuzzy
    dedup pipeline actually ships, instead of min-id. Integer-only
    ranking keys, so the argmax is engine- and partitioning-exact.
    Plan: component table (tiny, checkpoint-truncated lineage) joins the
    zero-shuffle flags scan; one window on the component key."""
    d = load(spark, sf_dir, "documents")
    pairs = D.minhash_near_dups(d, threshold=_KEEP_THRESHOLD).select(
        "doc_a", "doc_b"
    )
    comp = D.dedup_components(d, pairs, iterations=_KEEP_ITER)
    flags = C.gopher_flags(d).select("doc_id", "pass_all", "n_words")
    j = comp.join(flags, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("pass_all"), F.desc("n_words"), F.asc("doc_id")
    )
    ranked = j.withColumn("rk", F.row_number().over(w)).withColumn(
        "n_members", F.count(F.lit(1)).over(Window.partitionBy("component"))
    )
    return ranked.where(F.col("rk") == 1).select(
        "component",
        F.col("n_members").cast("long").alias("n_members"),
        F.col("doc_id").alias("keeper"),
        F.col("pass_all").cast("int").alias("keeper_pass_all"),
        F.col("n_words").cast("int").alias("keeper_n_words"),
    )
