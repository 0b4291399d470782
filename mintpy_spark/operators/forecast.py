"""Seasonal-naive forecast skill scoring (MASE) over the 1d count tier.

Reference analog: the reference validates its time-function models by
residual statistics per pixel (timeseries2velocity.py:404-415 residue;
timeseries_rms.py RMS ranking). The public forecasting counterpart is
the MASE skill score (Hyndman & Koehler 2006, "Another look at measures
of forecast accuracy"): a model's mean absolute error scaled by the
in-sample mean absolute error of the naive-1 forecast. Here the "model"
is the seasonal-naive baseline every capacity-planning pipeline starts
from — forecast(day d) = count(d - 7) — scored per series key.

Exactness: counts are integers, both error sums are integer sums, and
the reported ratio is the portable floor(x*1e4 + 0.5) basis-point
quantization of an integer-over-integer division — bit-reproducible
across engines and partitionings (same discipline as
operators/anomaly.burst_ratio_daily).

Plan shape: the daily-count agg shuffles once on (key, day); the two
lagged references come from ONE window pass over (key ORDER BY
epoch-day) using exact-offset RANGE frames ([-7,-7] and [-1,-1]) — a
gap day yields an empty frame (NULL) rather than silently reading the
previous *active* day, which is what a ROWS-frame lag would wrongly do.
Both Exchanges carry post-partial-agg rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snaive_mase_daily(
    events: DataFrame, key: str = "event_type", ts: str = "ts",
    season_days: int = 7,
) -> DataFrame:
    """Per-key MASE of the seasonal-naive forecast on the 1d count
    tier. Returns (key, n_scored, err_s, n_naive, err_1, mase_bp):
    err_s = Σ|c(d) − c(d−season)| over days where the seasonal lag
    exists (n_scored of them), err_1 = Σ|c(d) − c(d−1)| over days where
    the 1-day lag exists (n_naive), and
    mase_bp = floor((err_s/n_scored) / (err_1/n_naive) * 1e4 + 0.5) —
    NULL when either denominator is empty or err_1 = 0 (a metronomic
    series has no naive error to scale by). mase_bp < 10000 means the
    seasonal forecast beats naive-1."""
    day = F.date_trunc("day", F.col(ts).cast("timestamp"))
    c = (
        events.groupBy(F.col(key).alias(key), day.alias("bucket_day"))
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("d", F.datediff("bucket_day", F.lit("1970-01-01")))
    )
    w_s = (
        Window.partitionBy(key).orderBy("d")
        .rangeBetween(-season_days, -season_days)
    )
    w_1 = Window.partitionBy(key).orderBy("d").rangeBetween(-1, -1)
    lagged = c.withColumn("c_s", F.sum("c").over(w_s)).withColumn(
        "c_1", F.sum("c").over(w_1)
    )
    err_s = F.sum(F.abs(F.col("c") - F.col("c_s")))
    n_s = F.count(F.col("c_s"))
    err_1 = F.sum(F.abs(F.col("c") - F.col("c_1")))
    n_1 = F.count(F.col("c_1"))
    agg = lagged.groupBy(key).agg(
        n_s.cast("long").alias("n_scored"),
        err_s.cast("long").alias("err_s"),
        n_1.cast("long").alias("n_naive"),
        err_1.cast("long").alias("err_1"),
    )
    mase = F.floor(
        (F.col("err_s") / F.col("n_scored"))
        / (F.col("err_1") / F.col("n_naive"))
        * F.lit(10000.0)
        + F.lit(0.5)
    ).cast("long")
    return agg.select(
        key,
        "n_scored",
        F.coalesce("err_s", F.lit(0)).alias("err_s"),
        "n_naive",
        F.coalesce("err_1", F.lit(0)).alias("err_1"),
        F.when(
            (F.col("n_scored") > 0) & (F.col("err_1") > 0)
            & (F.col("n_naive") > 0),
            mase,
        ).alias("mase_bp"),
    )
