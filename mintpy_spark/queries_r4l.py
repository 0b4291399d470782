"""Round-4 batch l: the streaming near-dup INDEX under the driver
oracle — the dedup sibling of tier_realtime_read_check (queries_r4a.py).
The documents table is folded into DedupIndexMaintainer in two
micro-batches (signature shard + atomic commit marker per batch,
new-vs-new and new-vs-stored band probes, shared signature_verify
estimator); the union of emitted pairs must equal the one-shot batch
operator, whose generated SQL oracle (operators/dedup.minhash_oracle_sql)
is the same oracle dedup_minhash_lsh uses — so the driver hash certifies
the whole fold-probe-commit loop, not just batch LSH.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.operators import dedup as D
from mintpy_spark.queries import _q, load


@_q(
    "dedup_index_realtime_check",
    f"""
    SELECT doc_a, doc_b, ROUND(est_jaccard, 4) AS est_jaccard
    FROM ({D.minhash_oracle_sql(threshold=0.875)})
    """,
)
def dedup_index_realtime_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold documents into the streaming MinHash-LSH index in TWO
    micro-batches split by doc_id parity of position (first half /
    second half), then answer from emitted_pairs across committed
    batches. Equivalence contract under the driver hash: pairs emitted
    incrementally == dedup_minhash_lsh run once over everything.

    Reference analog: update-mode incremental reprocessing
    (utils/utils1.py:691 run_or_skip) — the index makes dedup
    delta-proportional instead of recompute-the-world.

    Scale: per batch, signatures are row-local and the probe join
    shuffles batch-band rows against the stored band projection (bucketed
    on band_key at production, so the stored side never reshuffles).
    """
    from mintpy_spark.streaming.dedup_stream import DedupIndexMaintainer

    docs = load(spark, sf_dir, "documents")
    mid_row = docs.select(
        F.percentile_approx("doc_id", 0.5, 10000).alias("m")
    ).collect()[0]
    mid = int(mid_row["m"])
    root = tempfile.mkdtemp(prefix="dedup_rt_check_")
    m = DedupIndexMaintainer(root, threshold=0.875)
    m.apply_batch(docs.where(F.col("doc_id") <= mid), batch_id=0)
    m.apply_batch(docs.where(F.col("doc_id") > mid), batch_id=1)
    # materialize off the store (localCheckpoint), then remove it — the
    # returned DataFrame must not depend on the temp directory
    pairs = m.emitted_pairs(spark).select(
        "doc_a", "doc_b", F.round("est_jaccard", 4).alias("est_jaccard")
    ).localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return pairs
