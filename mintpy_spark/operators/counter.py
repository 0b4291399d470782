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


def _reset_aware_delta(obs, counter_col: str, key: str, ts: str):
    """THE reset-aware PromQL delta chain shared by counter_increase and
    counter_rate (one implementation so the convention can never fork):
    drop NULL samples, lag over (key ORDER BY ts), delta = c - prev when
    monotone else c (reset). Returns (filtered obs, c, prev, delta)."""
    obs = obs.where(F.col(counter_col).isNotNull())
    w = Window.partitionBy(key).orderBy(ts)
    c = F.col(counter_col)
    prev = F.lag(counter_col).over(w)
    delta = F.when(prev.isNull(), F.lit(None)).when(c >= prev, c - prev).otherwise(c)
    return obs, c, prev, delta


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
    obs, c, prev, delta = _reset_aware_delta(obs, counter_col, key, ts)
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


def counter_rate(
    obs: DataFrame,
    counter_col: str,
    tier: str = "1d",
    key: str = "url",
    ts: str = "warc_ts",
) -> DataFrame:
    """PromQL-style ``rate()`` per tier bucket: (key, bucket_start,
    increase, span_us, rate) where rate = increase / covered-seconds
    (span measured in integer MICROseconds — sub-second scrape bursts
    are real spans, not zero; rate = increase / (span_us / 1e6)).

    The covered span is the observed sample window INSIDE the bucket
    (max - min sample timestamp over the bucket's samples), the
    convention PromQL uses for range vectors — dividing by the nominal
    bucket width would under-report rates for sparsely-scraped keys.
    Buckets whose samples give zero span (a single sample, or exact
    duplicate timestamps) yield NULL rate: no window to normalize by.
    ``increase`` is the reset-aware sum from counter_increase's delta (a
    delta is attributed to the bucket of its LATER sample, so
    bucket-crossing climbs land in the bucket that observed them).

    Plan shape: identical to counter_increase — one lag window on the
    series key + one hash agg; at 100 TB it rides the same hash(url)
    partitioning, no extra shuffle. The division is the only float op,
    over exact integer numerator/denominator, so it reproduces
    bit-for-bit across engines and partitionings."""
    obs, c, prev, delta = _reset_aware_delta(obs, counter_col, key, ts)
    epoch_us = F.unix_micros(F.col(ts).cast("timestamp"))
    agg = (
        obs.select(
            key,
            bucket_start(F.col(ts), tier).alias("bucket_start"),
            delta.alias("_d"),
            epoch_us.alias("_e"),
        )
        .groupBy(key, "bucket_start")
        .agg(
            F.sum("_d").alias("increase"),
            (F.max("_e") - F.min("_e")).alias("span_us"),
        )
    )
    rate = F.when(
        (F.col("span_us") > 0) & F.col("increase").isNotNull(),
        F.round(
            F.col("increase").cast("double")
            / (F.col("span_us").cast("double") / F.lit(1000000.0)),
            6,
        ),
    )
    return agg.select(key, "bucket_start", "increase", "span_us", rate.alias("rate"))
