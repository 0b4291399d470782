"""Round-3 batch ag: exact set-similarity join (AllPairs/PPJoin prefix
filter).

``dedup_ssjoin_exact`` returns EVERY document pair with 3-shingle
Jaccard >= 4/5 — no false negatives, unlike the banded MinHash path it
complements. The engine uses the rarity-ordered prefix filter + length
filter + exact verify; the oracle is the unfiltered all-pairs
formulation, so agreement proves the prefix filter is lossless on this
corpus (the paper's guarantee, exercised end-to-end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mintpy_spark.operators.ssjoin import ssjoin_jaccard, ssjoin_oracle_sql
from mintpy_spark.queries import _q, load


@_q("dedup_ssjoin_exact", ssjoin_oracle_sql(n=3, t_num=4, t_den=5))
def dedup_ssjoin_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.8 self-join on 3-shingle sets via prefix
    filtering. Candidate generation touches only |x|-ceil(0.8|x|)+1
    rarity-first tokens per document (rare tokens -> tiny buckets);
    integer cross-multiplied threshold so both engines agree bit-for-
    bit. The oracle does all-pairs with no filter — agreement = the
    lossless-filter guarantee, measured."""
    docs = load(spark, sf_dir, "documents")
    return ssjoin_jaccard(docs, n=3, t_num=4, t_den=5)
