"""Monotonic-counter semantics: reset-aware increase per tier bucket.

Web/infra series are often cumulative counters that wrap or reset on
restart (bytes served per host, crawl fetch counters). The derivative of
such a series is NOT ``lag``-delta: a reset (current < previous) must be
read as "the counter restarted from 0 and climbed to current", so the
bucket's increase is the sum of reset-aware deltas — the PromQL
``increase()`` convention (public Prometheus semantics).

The reference's analog is the temporal derivative
(reference: src/mintpy/timeseries2velocity.py temporal derivative;
operators/diff.py:108 here) — this operator is that derivative under the
counter-reset monoid instead of plain subtraction.

Plan shape: one window (lag over key, ordered by ts) + one hash agg per
tier bucket. The window partitions by the series key, so at 100 TB it
runs after the same hash(url) repartition every other per-key operator
uses — no extra shuffle in the maintained-store pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mintpy_spark.functions.timefn import bucket_start


def counter_increase(
    obs: DataFrame,
    counter_col: str,
    tier: str = "1d",
    key: str = "url",
    ts: str = "warc_ts",
) -> DataFrame:
    """obs with a cumulative counter -> (key, bucket_start, increase,
    n_resets, n_samples).

    Per sample delta = counter - lag(counter) when monotone, else
    counter (reset: the pre-reset climb between the two samples is
    unobservable, PromQL's convention). The first sample of a key
    contributes nothing (no baseline). NULL samples are dropped before
    the lag chain (Prometheus treats a missing scrape as absent, not
    zero): without the filter a NULL sample makes the NEXT sample's
    delta NULL too, silently losing the real increase across the gap.
    ``n_samples`` therefore counts non-NULL samples. Integer counters
    stay integers — no float drift."""
    obs = obs.where(F.col(counter_col).isNotNull())
    w = Window.partitionBy(key).orderBy(ts)
    c = F.col(counter_col)
    prev = F.lag(counter_col).over(w)
    delta = F.when(prev.isNull(), F.lit(None)).when(c >= prev, c - prev).otherwise(c)
    return (
        obs.select(
            key,
            bucket_start(F.col(ts), tier).alias("bucket_start"),
            delta.alias("_d"),
            (c < prev).cast("int").alias("_reset"),
        )
        .groupBy(key, "bucket_start")
        .agg(
            F.sum("_d").alias("increase"),
            F.sum("_reset").alias("n_resets"),
            F.count("*").alias("n_samples"),
        )
    )
