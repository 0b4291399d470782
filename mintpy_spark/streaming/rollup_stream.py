"""Incremental tier refresh via Structured Streaming.

The reference is strictly batch; its incremental story is update-mode
(run_or_skip, utils/utils1.py:691) re-running steps over grown inputs. The
engine's primary resume path is the checkpoint-table batch pipeline
(plans/pipeline.py) — this module is the *streaming* variant of the same
1h-tier computation for append-only crawl feeds:

    readStream(pages dir) -> extract/obs projection
      -> withWatermark(warc_ts) -> window(1h) agg partials -> append sink

Semantics notes:
* The aggregate stores the same decomposable partials (cnt/vsum/vmin/vmax)
  as the batch tier, so a streamed 1h tier cascades into 1d/30d with the
  identical batch operators — one code path for tier math.
* Watermark bounds state: buckets older than (max event time - watermark)
  are finalized and emitted exactly once (append mode). Late rows beyond
  the watermark are dropped — the batch backfill (pipeline resume) is the
  correction path, which is how production lambda-style tiering works.
* `Trigger.AvailableNow` turns the same query into an incremental batch
  job: each invocation processes only new files since the last checkpoint —
  the streaming twin of the checkpoint table's skip logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def streaming_tier_1h(
    spark: SparkSession,
    input_path: str,
    watermark: str = "2 hours",
    schema: T.StructType = PAGES_SCHEMA,
) -> DataFrame:
    """Build the streaming 1h-tier DataFrame (unstarted query plan)."""
    src = spark.readStream.schema(schema).parquet(input_path)
    obs = src.select(
        "url", "warc_ts", F.octet_length("text").alias("text_length")
    )
    return (
        obs.withWatermark("warc_ts", watermark)
        .groupBy("url", F.window("warc_ts", "1 hour").alias("w"))
        .agg(
            F.count("text_length").alias("cnt"),
            F.sum("text_length").alias("vsum"),
            F.min("text_length").alias("vmin"),
            F.max("text_length").alias("vmax"),
        )
        .select(
            "url",
            F.col("w.start").alias("bucket_start"),
            "cnt",
            "vsum",
            "vmin",
            "vmax",
        )
    )


def refresh_tier_1h(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    watermark: str = "2 hours",
    timeout_s: int = 300,
) -> None:
    """One incremental refresh: process all files not yet seen by the
    checkpoint, append finalized buckets to ``output_path``, stop."""
    tier = streaming_tier_1h(spark, input_path, watermark)
    q = (
        tier.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if q.isActive:  # pragma: no cover - safety on hang
        q.stop()
