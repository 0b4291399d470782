"""Gap-fill: reconstruct a regular per-key time grid from irregular obs.

This is the engine's recast of the reference's SBAS network inversion
(reference: src/mintpy/ifgram_inversion.py:91-227 ``estimate_timeseries``):
the min-norm-velocity solution solves piecewise velocities between
consecutive dates and cumulative-sums them (ifgram_inversion.py:194-196),
which for a connected network reduces to *piecewise-linear reconstruction
across missing dates* — the ``linear`` mode here. The ``last_obs`` mode is
the step-function variant (last observation carried forward).

Plan shape (all JVM-side, no Python):

  1. bucket each VALUE-BEARING observation to the grid resolution; keep
     the latest obs per (key, bucket) via a deterministic struct max
     (dedup-in-bucket policy; NULL values are no-data and excluded),
  2. per key, generate the dense grid with ``sequence() + explode`` between
     the key's first and last bucket (partition-pruned, no cross join),
  3. left join grid <- bucketed obs on (key, bucket)  [single shuffle],
  4. fill with ignore-nulls window functions:
       last_obs: last(value) over (key order by bucket, unbounded preceding)
       linear:   interpolate between the previous and next real observation
                 using their *actual* timestamps (not bucket starts), exactly
                 mirroring the reference's tbase_diff math
                 (ifgram_inversion.py:195-196).

At 100 TB the grid explode is bounded per key (8760 rows/key/year at 1h) and
the join + windows all partition on the key hash — one shuffle total, then
partition-local sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mintpy_spark.functions.timefn import TIER_SECONDS, bucket_start


def bucketize(
    obs: DataFrame, value_col: str, tier: str, key: str = "url", ts: str = "warc_ts"
) -> DataFrame:
    """Latest VALUE-BEARING observation per (key, bucket):
    (key, bucket_start, obs_ts, value).

    NULL-valued observations are no-data (the mask.py sentinel contract)
    and are excluded up front — otherwise a null-valued obs would set the
    bucket's obs_ts while contributing no value, and the gap-fill windows
    downstream would stitch prev/next timestamps and values from
    DIFFERENT rows (linear mode then divides by a zero time span).
    The in-bucket dedup is a struct max over (obs_ts, value): argmax by
    ts with the value as a deterministic tie-break — a bare
    max_by(value, ts) is tie-ambiguous across partitionings/engines
    (same trap rollup_openclose documents)."""
    b = bucket_start(F.col(ts), tier).alias("bucket_start")
    return (
        obs.select(key, b, F.col(ts).alias("obs_ts"), F.col(value_col).alias("value"))
        .where(F.col("value").isNotNull())
        .groupBy(key, "bucket_start")
        .agg(F.max(F.struct("obs_ts", "value")).alias("_m"))
        .select(
            key,
            "bucket_start",
            F.col("_m.obs_ts").alias("obs_ts"),
            F.col("_m.value").alias("value"),
        )
    )


def dense_grid(bucketed: DataFrame, tier: str, key: str = "url") -> DataFrame:
    """Per-key dense bucket grid [first bucket .. last bucket] step tier."""
    step = F.expr(f"interval {TIER_SECONDS[tier]} seconds")
    return (
        bucketed.groupBy(key)
        .agg(F.min("bucket_start").alias("b0"), F.max("bucket_start").alias("b1"))
        .select(key, F.explode(F.sequence("b0", "b1", step)).alias("bucket_start"))
    )


def gapfill(
    obs: DataFrame,
    value_col: str,
    tier: str = "1h",
    mode: str = "last_obs",
    key: str = "url",
    ts: str = "warc_ts",
) -> DataFrame:
    """Dense per-key series: (key, bucket_start, value, filled).

    mode='last_obs' -> step reconstruction; mode='linear' -> piecewise
    linear between real observations (flat extrapolation at the edges,
    matching the reference's behavior of no model outside the network);
    mode='nearest' -> the temporally closer of the surrounding real
    observations, previous on exact ties (the reference's 'nearest'
    resample/interp family, multilook.py nearest mode).
    """
    if mode not in ("last_obs", "linear", "nearest"):
        raise ValueError(f"unknown gapfill mode {mode!r}")
    bucketed = bucketize(obs, value_col, tier, key=key, ts=ts)
    grid = dense_grid(bucketed, tier, key=key)
    joined = grid.join(bucketed, [key, "bucket_start"], "left")

    w_back = (
        Window.partitionBy(key)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_val = F.last("value", ignorenulls=True).over(w_back)
    if mode == "last_obs":
        return joined.select(
            key,
            "bucket_start",
            prev_val.alias("value"),
            F.col("value").isNull().alias("filled"),
        )

    w_fwd = (
        Window.partitionBy(key)
        .orderBy("bucket_start")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # NTZ timestamps cannot cast straight to double under ANSI; go via timestamp
    obs_sec = F.col("obs_ts").cast("timestamp").cast("double")
    prev_ts = F.last(obs_sec, ignorenulls=True).over(w_back)
    next_val = F.first("value", ignorenulls=True).over(w_fwd)
    next_ts = F.first(obs_sec, ignorenulls=True).over(w_fwd)
    t = F.col("bucket_start").cast("timestamp").cast("double")
    if mode == "nearest":
        nearest = F.when(
            (t - prev_ts) <= (next_ts - t), prev_val
        ).otherwise(next_val)
        filled_val = F.when(F.col("value").isNotNull(), F.col("value")).otherwise(
            F.when(prev_val.isNull(), next_val)
            .when(next_val.isNull(), prev_val)
            .otherwise(nearest)
        )
        return joined.select(
            key,
            "bucket_start",
            filled_val.alias("value"),
            F.col("value").isNull().alias("filled"),
        )
    interp = F.when(F.col("value").isNotNull(), F.col("value")).otherwise(
        F.when(prev_val.isNull(), next_val)
        .when(next_val.isNull(), prev_val)
        .otherwise(
            prev_val + (next_val - prev_val) * (t - prev_ts) / (next_ts - prev_ts)
        )
    )
    return joined.select(
        key,
        "bucket_start",
        interp.alias("value"),
        F.col("value").isNull().alias("filled"),
    )
