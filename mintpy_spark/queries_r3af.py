"""Round-3 batch af: winnowing fingerprints and exact triangle count.

* ``text_winnow_stats`` — per-document MOSS fingerprint census: k-gram
  count, winnowed fingerprint count, and measured density (expected
  ~2/(w+1)). The engine selection is shuffle-free array arithmetic; the
  oracle re-derives the same selection with window functions + QUALIFY
  — two independent formulations of the rightmost-min rule.
* ``dedup_winnow_pairs`` — the MOSS overlap report: document pairs
  sharing >= 3 distinct fingerprint hashes, boilerplate-capped at
  document frequency 50 (LSH-bucket-cap discipline).
* ``graph_triangle_count`` — exact triangles of the part co-purchase
  graph via degree-ordered wedge joins (Suri-Vassilvitskii shape: wedge
  fan-out O(|E|^1.5) regardless of skew); the oracle is the textbook
  a<b<c three-way self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mintpy_spark.operators.graph import copurchase_edges, triangle_count
from mintpy_spark.operators.winnow import (
    winnow_oracle_cte,
    winnow_pairs,
    winnow_stats,
)
from mintpy_spark.queries import _q, load

_K, _W = 5, 4


@_q(
    "text_winnow_stats",
    f"""
    WITH {winnow_oracle_cte(k=_K, w=_W)},
    f AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fps
          FROM sel GROUP BY 1),
    kg AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                  - {_K - 1} AS BIGINT) AS n_kgrams
      FROM documents
      WHERE len(list_filter(string_split(text, ' '), t -> t <> ''))
            >= {_K + _W - 1})
    SELECT kg.doc_id, kg.n_kgrams, f.n_fps,
           CAST(floor(f.n_fps * 10000.0 / kg.n_kgrams + 0.5) AS BIGINT)
             AS density_bp
    FROM kg JOIN f USING (doc_id)
    """,
)
def text_winnow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing density census (k=5, w=4): every document's fingerprint
    count against its k-gram count. The engine's selection never leaves
    the scan-stage projection (array slide-min + distinct per row); the
    only Exchanges are the per-doc agg and the join back — both on
    doc_id, AQE-broadcast at small SF."""
    docs = load(spark, sf_dir, "documents")
    return winnow_stats(docs, k=_K, w=_W)


@_q(
    "dedup_winnow_pairs",
    f"""
    WITH {winnow_oracle_cte(k=_K, w=_W)},
    f AS (SELECT DISTINCT doc_id, fp // 1048576 AS h FROM sel),
    ok AS (SELECT h FROM f GROUP BY h HAVING COUNT(*) BETWEEN 2 AND 50),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM f a JOIN ok USING (h) JOIN f b USING (h)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b, n_shared FROM p WHERE n_shared >= 3
    """,
)
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS overlap pairs: >= 3 shared distinct fingerprint hashes, df
    cap 50 against boilerplate buckets. One shuffle clustered on the
    fingerprint hash does candidate generation; the guarantee is
    positional — any shared token run of >= k+w-1 tokens leaves at
    least one shared fingerprint (Schleimer et al. 2003, Thm 1)."""
    docs = load(spark, sf_dir, "documents")
    return winnow_pairs(docs, k=_K, w=_W, min_shared=3, df_cap=50)


@_q(
    "graph_triangle_count",
    """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM (SELECT pa AS x FROM e UNION SELECT pb FROM e)),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM e e1
      JOIN e e2 ON e1.pb = e2.pa
      JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb)
    SELECT n.n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           t.n_triangles
    FROM n, t
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the support>=2 co-purchase graph. Engine:
    degree-ordered orientation (ties broken by id inside the packed ord)
    so each triangle is wedged exactly once at its lowest-ord vertex and
    the wedge fan-out is skew-immune; oracle: naive a<b<c self-joins.
    Agreement pins the orientation logic, the classic place triangle
    counters double-count."""
    li = load(spark, sf_dir, "lineitem")
    return triangle_count(copurchase_edges(li, min_support=2))
