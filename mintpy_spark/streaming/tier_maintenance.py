"""Streaming continuous-aggregate maintenance: the full production loop.

``readStream(pages/obs dir) -> foreachBatch(refresh_tiers_incremental)``:
each micro-batch is a late/new-observation delta folded into the STORED
tier tables by partial-wise merge (finest tier) + dirty-bucket cascade
refresh (coarser tiers) — see operators/rollup.py. The stored tables live
in a TableStore (partition-atomic overwrite); the streaming checkpoint
makes batch delivery exactly-once, so the maintained tiers equal a batch
rebuild over everything ever ingested (verified by
tests/test_streaming.py::test_streaming_tier_maintenance...).

Why foreachBatch and not a streaming aggregation: the watermark path
(rollup_stream.py) FINALIZES buckets and drops later arrivals — right for
append-only emission; tier MAINTENANCE must keep every bucket updatable
forever, which is state Structured Streaming cannot hold. foreachBatch
turns each micro-batch into a bounded batch job against durable tables —
the lambda-architecture merge loop, with the delta-proportional cost the
north rule's continuous aggregates require.

Scale: per batch, cost = delta aggregation + touched-cell rewrite. The
stored tier tables should be bucketed on the key (sources/bucketed.py) so
the merge joins co-locate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.operators.rollup import build_tiers, refresh_tiers_incremental
from mintpy_spark.plans.checkpoint import CheckpointTable

TIERS = ("1h", "1d", "30d")


class TierMaintainer:
    """Holds the stored-tier locations and applies one delta per call."""

    def __init__(
        self, root: str, value_col: str = "text_length",
        key: str = "url", ts: str = "warc_ts", tiers: tuple[str, ...] = TIERS,
    ) -> None:
        self.root = root
        self.value_col = value_col
        self.key = key
        self.ts = ts
        self.tiers = tiers
        # per-batch lineage metrics — the maintenance twin of the batch
        # pipeline's checkpoint table (plans/checkpoint.py): every fold
        # records (batch_id, tier, rows, wall) so operators can audit what
        # each refresh touched and when
        self.metrics = CheckpointTable(f"{root}/_maintenance_metrics")

    def _path(self, tier: str) -> str:
        return f"{self.root}/tier_{tier}"

    def _exists(self, spark: SparkSession, tier: str) -> bool:
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path(self._path(tier))
        fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.exists(jvm_path))

    def read_tier(self, spark: SparkSession, tier: str) -> DataFrame:
        return spark.read.parquet(self._path(tier))

    def apply_delta(self, delta_obs: DataFrame, batch_id: int = 0) -> None:
        """One maintenance step: merge the delta into every stored tier.

        First batch bootstraps the tier tables from the delta alone.
        Results are materialized (the refresh reads the CURRENT stored
        tables, so the write must not overlap the read) and written
        atomically per tier via overwrite.
        """
        spark = delta_obs.sparkSession
        if delta_obs.isEmpty():
            return
        if not self._exists(spark, self.tiers[0]):
            new = build_tiers(
                delta_obs, self.value_col, tiers=self.tiers,
                key=self.key, ts=self.ts,
            )
        else:
            stored = {t: self.read_tier(spark, t) for t in self.tiers}
            new = refresh_tiers_incremental(
                stored, delta_obs, self.value_col, tiers=self.tiers,
                key=self.key, ts=self.ts,
            )
        # materialize EVERY tier before writing ANY: each coarser tier's
        # plan reads the finer stored table, so overwriting tier_1h before
        # tier_1d materializes would make tier_1d re-read replaced files
        # (FAILED_READ_FILE). localCheckpoint(eager) snapshots them all
        # against the pre-write state.
        import time as _time

        t0 = _time.time()
        materialized = {t: new[t].localCheckpoint(eager=True) for t in self.tiers}
        for t in self.tiers:
            materialized[t].write.mode("overwrite").parquet(self._path(t))
        wall_ms = int((_time.time() - t0) * 1000)
        self.metrics.append(
            [
                {
                    "run_id": f"batch{batch_id}",
                    "stage": f"maintain_{t}",
                    "part_id": 0,
                    "input_fp": "delta",
                    "row_count": int(materialized[t].count()),
                    "wall_ms": wall_ms,
                    "status": "complete",
                }
                for t in self.tiers
            ]
        )

    def foreach_batch(self):
        """The writeStream.foreachBatch callable."""

        def fn(batch_df: DataFrame, batch_id: int) -> None:
            self.apply_delta(batch_df, batch_id)

        return fn


def maintain_tiers(
    spark: SparkSession,
    input_path: str,
    store_root: str,
    checkpoint: str,
    schema: str = "url string, warc_ts timestamp, text_length long",
    value_col: str = "text_length",
) -> None:
    """Run one AvailableNow maintenance pass: new files since the last
    checkpoint are folded into the stored tiers and the query stops."""
    m = TierMaintainer(store_root, value_col=value_col)
    src = spark.readStream.schema(schema).parquet(input_path)
    q = (
        src.writeStream.foreachBatch(m.foreach_batch())
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
