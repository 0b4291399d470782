"""Incremental near-duplicate index maintenance (streaming MinHash-LSH).

Production dedup cannot re-run all-pairs LSH over the full corpus per
ingest batch; it maintains an INDEX: per micro-batch of new documents,

1. compute MinHash signatures for the batch only (row-local, zero
   shuffle — operators/dedup.minhash_signatures),
2. probe the stored signature index with the batch's band keys:
   new-vs-stored candidates from a band equi-join, new-vs-new from the
   batch's band self-join,
3. signature-verify candidates (matching-permutation fraction >=
   threshold — identical estimator to the batch operator), emit pairs,
4. append the batch's signatures to the index.

Equivalence contract (tested): the union of pairs emitted across
batches equals `dedup.minhash_near_dups` run once over everything
ingested — a pair is emitted exactly once, in the first batch where its
later member arrives.

Crash safety: same protocol as TierMaintainer — each batch writes its
signature shard to ``sig/b{N}/`` then atomically creates the marker
``_commits/b{N}``; a replayed committed batch is skipped outright; a
crashed batch overwrites its orphan shard on replay. Readers (the probe
join) only load committed shards, so a half-written shard is never
probed. foreachBatch's at-least-once becomes exactly-once emission.

Scale shape: per batch the probe join shuffles batch-band rows against
the stored band projection — at 10^12 docs the index is bucketed on
``band_key`` (sources/bucketed.py) so the probe co-locates without
shuffling the stored side; the signature shard append is partition-local.
The emitted-pairs stream feeds keeper resolution / connected components
downstream (operators/dedup.dedup_components).

Reference analog: MintPy's update mode re-runs steps over grown inputs
(utils/utils1.py:691 run_or_skip); the index turns that
recompute-the-world shape into delta-proportional work, the same move
the tier maintainer makes for rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.operators.dedup import (
    NUM_PERM,
    lsh_bands,
    minhash_signatures,
    signature_verify,
)


class DedupIndexMaintainer:
    """Holds the signature-index location and folds one batch per call."""

    def __init__(
        self,
        root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        threshold: float = 0.5,
        num_perm: int = NUM_PERM,
    ) -> None:
        self.root = root
        self.id_col = id_col
        self.text_col = text_col
        self.threshold = threshold
        self.num_perm = num_perm

    # filesystem helpers (hadoop FS API — portable across Spark filesystems)
    def _fs(self, spark: SparkSession, path: str):
        p = spark._jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(spark._jsc.hadoopConfiguration()), p

    def committed_batches(self, spark: SparkSession) -> list[int]:
        fs, p = self._fs(spark, f"{self.root}/_commits")
        if not fs.exists(p):
            return []
        out = []
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if name.startswith("b"):
                out.append(int(name[1:]))
        return sorted(out)

    def _commit(self, spark: SparkSession, batch_id: int) -> None:
        fs, d = self._fs(spark, f"{self.root}/_commits")
        fs.mkdirs(d)
        _, marker = self._fs(spark, f"{self.root}/_commits/b{batch_id}")
        fs.create(marker, True).close()

    def stored_signatures(self, spark: SparkSession) -> DataFrame | None:
        """Union of committed signature shards (None before first commit)."""
        batches = self.committed_batches(spark)
        if not batches:
            return None
        paths = [f"{self.root}/sig/b{b}" for b in batches]
        return spark.read.parquet(*paths)

    def apply_batch(
        self, new_docs: DataFrame, batch_id: int = 0
    ) -> DataFrame | None:
        """Fold one batch; returns the emitted near-dup pairs
        (doc_a < doc_b, est_jaccard >= threshold), or None for a replay
        of an already-committed batch."""
        spark = new_docs.sparkSession
        if batch_id in self.committed_batches(spark):
            return None
        sig_new = minhash_signatures(
            new_docs, self.id_col, self.text_col, self.num_perm
        ).localCheckpoint(eager=True)
        bands_new = lsh_bands(sig_new, self.id_col)
        stored = self.stored_signatures(spark)

        id_a, id_b = f"ba.{self.id_col}", f"bb.{self.id_col}"
        cands = []
        a, b = bands_new.alias("ba"), bands_new.alias("bb")
        cands.append(  # new vs new (ordered to avoid dupes/self-pairs)
            a.join(
                b,
                (F.col("ba.band_id") == F.col("bb.band_id"))
                & (F.col("ba.band_key") == F.col("bb.band_key"))
                & (F.col(id_a) < F.col(id_b)),
            ).select(
                F.col(id_a).alias("doc_a"), F.col(id_b).alias("doc_b")
            )
        )
        if stored is not None:
            bands_old = lsh_bands(stored, self.id_col)
            o, n = bands_old.alias("ba"), bands_new.alias("bb")
            cands.append(  # stored vs new; normalize pair order by id
                o.join(
                    n,
                    (F.col("ba.band_id") == F.col("bb.band_id"))
                    & (F.col("ba.band_key") == F.col("bb.band_key"))
                    & (F.col(id_a) != F.col(id_b)),
                ).select(
                    F.least(F.col(id_a), F.col(id_b)).alias("doc_a"),
                    F.greatest(F.col(id_a), F.col(id_b)).alias("doc_b"),
                )
            )
        cand = cands[0] if len(cands) == 1 else cands[0].unionByName(cands[1])
        cand = cand.distinct()

        all_sigs = (
            sig_new if stored is None else stored.unionByName(sig_new)
        )
        pairs = signature_verify(
            cand, all_sigs, self.id_col, self.num_perm, self.threshold
        ).localCheckpoint(eager=True)
        # shard write THEN marker: replay of a crashed batch overwrites
        sig_new.write.mode("overwrite").parquet(f"{self.root}/sig/b{batch_id}")
        pairs.write.mode("overwrite").parquet(f"{self.root}/pairs/b{batch_id}")
        self._commit(spark, batch_id)
        return pairs

    def emitted_pairs(self, spark: SparkSession) -> DataFrame | None:
        batches = self.committed_batches(spark)
        if not batches:
            return None
        return spark.read.parquet(
            *[f"{self.root}/pairs/b{b}" for b in batches]
        )

    def foreach_batch(self):
        """writeStream.foreachBatch callable."""

        def fn(batch_df: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch_df, batch_id)

        return fn
