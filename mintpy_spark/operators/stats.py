"""Aggregation statistics over the (key × time) grid.

Reference analogs (SURVEY.md §2.4):
* spatial_average  — per-epoch mean across pixels (stack.py:434-449); here
  per-timestamp/bucket mean across urls.
* temporal_average — per-pixel mean across time (stack.py:451-456).
* timeseries_std / timeseries_rms — per-epoch std / RMS (stack.py:371-432).
* residual-RMS reference-date selection + MAD outlier exclusion
  (timeseries_rms.py:35-72; MAD utils/utils0.py:1166-1221).

All pure Catalyst aggregates: partial+final hash agg, one shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def spatial_average(
    obs: DataFrame, value_col: str, time_col: str = "warc_ts", use_median: bool = False
) -> DataFrame:
    """Per-epoch cross-key mean (or exact median, the ifgramStack variant
    stack.py:871-919)."""
    agg = (
        F.median(value_col).alias("spatial_med")
        if use_median
        else F.avg(value_col).alias("spatial_avg")
    )
    return obs.groupBy(time_col).agg(agg, F.count(value_col).alias("cnt"))


def temporal_average(obs: DataFrame, value_col: str, key: str = "url") -> DataFrame:
    """Per-key mean over time (stack.py:451-456)."""
    return obs.groupBy(key).agg(
        F.avg(value_col).alias("temporal_avg"), F.count(value_col).alias("cnt")
    )


def epoch_std_rms(
    obs: DataFrame, value_col: str, time_col: str = "warc_ts"
) -> DataFrame:
    """Per-epoch std (sample, ddof=1 matching np.std? — the reference uses
    np.nanstd, ddof=0: population) and RMS (stack.py:371-432)."""
    v = F.col(value_col)
    return obs.groupBy(time_col).agg(
        F.stddev_pop(value_col).alias("std"),
        F.sqrt(F.avg(v * v)).alias("rms"),
        F.count(value_col).alias("cnt"),
    )


def auto_reference_epoch(epoch_rms: DataFrame, time_col: str = "warc_ts") -> str:
    """argmin(RMS) epoch — auto reference-date selection
    (timeseries_rms.py:37)."""
    return epoch_rms.agg(F.min_by(time_col, "rms").alias("ref")).collect()[0]["ref"]


def mad_outlier_epochs(
    epoch_rms: DataFrame, cutoff: float = 3.0, time_col: str = "warc_ts"
) -> DataFrame:
    """Epochs whose RMS deviates > cutoff * 1.4826 * MAD from the median —
    the exclude-date detector (utils/utils0.py:1166-1221 median_abs_deviation
    with scale='normal', timeseries_rms.py:45-72)."""
    med = epoch_rms.agg(F.median("rms").alias("m")).collect()[0]["m"]
    mad = (
        epoch_rms.select(F.abs(F.col("rms") - F.lit(med)).alias("d"))
        .agg(F.median("d").alias("mad"))
        .collect()[0]["mad"]
    )
    thresh = med + cutoff * 1.4826 * (mad or 0.0)
    return epoch_rms.where(F.col("rms") > thresh).select(time_col, "rms")


def deramp_epoch(
    obs: DataFrame,
    value_col: str,
    coord_col: str,
    time_col: str = "warc_ts",
) -> DataFrame:
    """Per-epoch linear detrend against a 1-D coordinate.

    Reference analog: deramp — per-epoch polynomial surface fit in (y, x)
    subtracted from the image (objects/ramp.py:24-127, order 'linear').
    Here the epoch's cross-section is regressed on ``coord_col`` via the
    closed-form OLS (covar_pop/var_pop window aggregates — no solver, no
    Python) and the fitted ramp is subtracted row-wise. Zero-variance
    epochs (single point) fall back to mean-centering.
    """
    w = Window.partitionBy(time_col)
    x = F.col(coord_col).cast("double")
    v = F.col(value_col).cast("double")
    slope_raw = F.covar_pop(x, v).over(w) / F.nullif(F.var_pop(x).over(w), F.lit(0.0))
    slope = F.coalesce(slope_raw, F.lit(0.0))
    fitted = F.avg(v).over(w) + slope * (x - F.avg(x).over(w))
    return obs.withColumn("deramped", v - fitted)


def temporal_coherence(
    obs: DataFrame, resid_col: str, key: str = "url"
) -> DataFrame:
    """|sum(exp(i * resid))| / n per key — the reference's inversion
    quality metric (ifgram_inversion.py:291-363 calc_inv_quality), as two
    trig aggregates (the complex sum's re/im parts); coherence 1.0 means
    all residuals agree in phase."""
    r = F.col(resid_col).cast("double")
    return (
        obs.groupBy(key)
        .agg(
            F.sum(F.cos(r)).alias("_re"),
            F.sum(F.sin(r)).alias("_im"),
            F.count(resid_col).alias("n"),
        )
        .select(
            key,
            (F.sqrt(F.col("_re") ** 2 + F.col("_im") ** 2) / F.col("n")).alias(
                "coherence"
            ),
            "n",
        )
    )
