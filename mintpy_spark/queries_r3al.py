"""Round-3 batch al: product-quantization ANN — the codes-not-vectors
memory tier of the similarity-search family (brute-force -> LSH -> SQ ->
IVF -> PQ), with asymmetric-distance candidate generation and exact
cosine rescoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mintpy_spark.operators import similarity as S
from mintpy_spark.queries import _q, load


@_q(
    "simsearch_pq_topk",
    S.pq_oracle_sql(query_id=0, k=10, n_candidates=50, num_subspaces=4,
                    num_codes=16, dim=64),
)
def simsearch_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN top-10 for query vector 0: 4 subspaces x 16 codewords
    (deterministic sample codebook), broadcast ADC lookup, exact-cosine
    rescore of the top-50 ADC candidates
    (operators/similarity.pq_topk)."""
    emb = load(spark, sf_dir, "embeddings")
    return S.pq_topk(emb, query_id=0, k=10, n_candidates=50,
                     num_subspaces=4, num_codes=16)
