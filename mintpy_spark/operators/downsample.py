"""Visual / query-serving downsampling over tiered series.

Two operators round out the engine's downsample family (next to the
decimating ``multilook`` and the averaging tier rollups):

* :func:`m4_downsample` — the M4 aggregation (Jugel et al., "M4: A
  Visualization-Oriented Time Series Data Aggregation", VLDB 2014, public
  literature): per (key, bucket) keep the first/min/max/last values, the
  four points that reproduce a pixel-perfect line rendering of the raw
  series at a given horizontal resolution. The reference's analog is the
  plot-decimation / multilook path (reference: src/mintpy/multilook.py:19
  nearest-kept decimation; view-layer decimation) — M4 is the
  error-bounded version of that decimation, expressed here as one
  hash aggregation (no window, no shuffle beyond the groupBy).

* :func:`sliding_from_tier` — trailing k-bucket sliding aggregates
  computed FROM stored tier partials (continuous-aggregate sliding
  window): the TimescaleDB-style "aggregate over aggregates" read path.
  The reference's analog is the temporal running mean
  (reference: src/mintpy/tsview.py runmean; utils/utils1.py temporal
  filters) — but evaluated over tier partials so a 7-day moving window at
  100 TB reads ~1/24th the rows the raw series would need (1d tier vs
  hourly raw), and the window frame is a RANGE over integer day numbers,
  never over raw timestamps.

Both are pure Catalyst plans (whole-stage codegen; the M4 arg-extremes
use min_by/max_by-free struct ordering so ties break deterministically on
the tuple, identical to the documented oracle formulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mintpy_spark.functions.timefn import TIER_SECONDS, bucket_start


def m4_downsample(
    obs: DataFrame,
    value_col: str,
    tier: str = "1d",
    key: str = "url",
    ts: str = "warc_ts",
) -> DataFrame:
    """obs -> (key, bucket_start, v_first, v_min, v_max, v_last, cnt).

    First/last are the values at the min/max timestamp inside the bucket
    (ties on the timestamp break toward the smaller value, deterministic):
    implemented as ``min(struct(ts, v))`` / ``max(struct(ts, v))`` —
    struct ordering is lexicographic, so the aggregation stays a single
    map-side-combinable hash agg with no window and no second shuffle.
    """
    v = F.col(value_col).cast("double")
    staged = obs.select(
        key,
        bucket_start(F.col(ts), tier).alias("bucket_start"),
        F.col(ts).alias("_t"),
        v.alias("_v"),
    )
    return (
        staged.groupBy(key, "bucket_start")
        .agg(
            F.min(F.struct("_t", "_v")).alias("_first"),
            F.min("_v").alias("v_min"),
            F.max("_v").alias("v_max"),
            F.max(F.struct("_t", "_v")).alias("_last"),
            F.count("_v").alias("cnt"),
        )
        .select(
            key,
            "bucket_start",
            F.col("_first._v").alias("v_first"),
            "v_min",
            "v_max",
            F.col("_last._v").alias("v_last"),
            "cnt",
        )
    )


def sliding_from_tier(
    tier_df: DataFrame,
    tier: str = "1d",
    trailing: int = 7,
    key: str = "url",
) -> DataFrame:
    """Trailing-``trailing``-bucket sliding aggregates from tier partials.

    For every stored bucket, aggregate the partials of the previous
    ``trailing`` buckets (inclusive): a 7-day moving count/sum/min/max
    anchored at each day the key has data. The frame is
    ``rangeBetween(-(trailing-1), 0)`` over the integer bucket NUMBER
    (bucket_start seconds / tier width) — integer range frames are exact
    and engine-portable, unlike interval frames over microsecond
    timestamps (memory: window range frames trap). Missing buckets inside
    the trailing window contribute nothing, matching a raw-data
    range-window over the same horizon.
    """
    width = TIER_SECONDS[tier]
    day_no = (F.col("bucket_start").cast("timestamp").cast("long") / width).cast("long")
    w = (
        Window.partitionBy(key)
        .orderBy("bucket_no")
        .rangeBetween(-(trailing - 1), 0)
    )
    return (
        tier_df.withColumn("bucket_no", day_no)
        .select(
            key,
            "bucket_start",
            F.sum("cnt").over(w).alias("w_cnt"),
            F.sum("vsum").over(w).alias("w_vsum"),
            F.min("vmin").over(w).alias("w_vmin"),
            F.max("vmax").over(w).alias("w_vmax"),
        )
    )


def ltob_downsample(
    obs: DataFrame,
    value_col: str,
    tier: str = "1d",
    key: str = "url",
    ts: str = "warc_ts",
    value_scale: int = 100,
) -> DataFrame:
    """LTOB (Largest-Triangle-One-Bucket) downsampling: per (key, bucket)
    keep the single observation whose triangle with its immediate raw
    neighbors has the largest area (Steinarsson, "Downsampling Time Series
    for Visual Representation", 2013 — public literature; the
    shape-preserving sibling of :func:`m4_downsample`, and the
    importance-weighted version of the reference's nearest-kept multilook
    decimation, src/mintpy/stdproc/multilook.py:19).

    Exactness discipline: the triangle area is computed ENTIRELY in 64-bit
    integers — timestamps as epoch microseconds, values scaled by
    ``value_scale`` (fixed-point; testdata values carry 2 decimals) via
    ``floor(v*scale + 0.5)`` which is bit-identical across engines, unlike
    ROUND's half-even/half-up divergence.  ``area2`` is twice the triangle
    area (the cross product), never divided, so ranking is exact integer
    comparison and the argmax is engine-portable.  Magnitude bound: gap(us)
    * scaled-value-delta ~ 2.6e12 * 1e4 = 2.6e16 << 2^63.

    Edge observations (no predecessor or no successor in the key's raw
    series) carry NULL area and sort last (NULLS LAST in both engines), so
    they are elected only when a bucket contains nothing else.  Ties break
    on the earlier timestamp.  Plan: one hash shuffle on ``key`` feeds both
    the neighbor window and the per-bucket rank window (same partitioning),
    then a filter — no second exchange.
    """
    t_us = F.unix_micros(F.col(ts).cast("timestamp"))
    v_scaled = F.floor(F.col(value_col).cast("double") * value_scale + F.lit(0.5)).cast(
        "long"
    )
    staged = obs.select(
        key,
        F.col(ts).alias("_ts"),
        bucket_start(F.col(ts), tier).alias("bucket_start"),
        t_us.alias("_t"),
        v_scaled.alias("_v"),
    )
    wn = Window.partitionBy(key).orderBy("_t")
    nbr = (
        staged.withColumn("_tp", F.lag("_t").over(wn))
        .withColumn("_vp", F.lag("_v").over(wn))
        .withColumn("_tn", F.lead("_t").over(wn))
        .withColumn("_vn", F.lead("_v").over(wn))
    )
    area2 = F.abs(
        (F.col("_tp") - F.col("_tn")) * (F.col("_v") - F.col("_vp"))
        - (F.col("_tp") - F.col("_t")) * (F.col("_vn") - F.col("_vp"))
    )
    wr = Window.partitionBy(key, "bucket_start").orderBy(
        F.desc_nulls_last("area2"), F.asc("_t")
    )
    return (
        nbr.withColumn("area2", area2)
        .withColumn("_rn", F.row_number().over(wr))
        .where(F.col("_rn") == 1)
        .select(
            key,
            "bucket_start",
            F.col("_ts").alias("ts"),
            (F.col("_v").cast("double") / value_scale).alias("value"),
            "area2",
        )
    )
