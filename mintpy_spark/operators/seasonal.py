"""STL-lite seasonal decomposition: per-observation trend / seasonal /
residual components from window aggregations.

Reference analog: MintPy's time-function regression fits trend +
periodic terms GLOBALLY per series (timeseries2velocity model dict;
operators/timefunc.py here). This operator is the nonparametric local
counterpart — classic STL (Cleveland et al. 1990, public literature)
reduced to its two moving-average passes:

    trend_t    = centered moving average over ±h observations
    seasonal_p = mean over the series of (value - trend) at phase p
    residual_t = value - trend - seasonal_{phase(t)}

A crawl pipeline uses it to separate diurnal template churn (seasonal)
from genuine drift (trend) and incidents (residual) per url.

Exact-partials discipline (operators/anomaly.py): values quantize to
fixed-point int64 (functions shared with the z-score monitor), the
centered window sum and the per-phase detrended sums are exact integers
(detrended is kept scaled by W = 2h+1 so it stays integral), and the
final trend/seasonal/residual floats are fixed op sequences over those
integers — bit-identical on every engine and partitioning. Float window
means would NOT parity-match: DuckDB evaluates window sums over segment
trees, Spark over running frames, and double addition is
order-sensitive.

Plan shape: one (key ORDER BY ts) window + one (key, phase) hash agg +
one vocabulary-thin join back — all on the series key's partitioning,
the same single-Exchange family as every per-key operator here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mintpy_spark.operators.anomaly import quantize_fixed


def stl_decompose(
    obs: DataFrame,
    value_col: str,
    key: str = "url",
    ts: str = "warc_ts",
    half_window: int = 12,
    scale: float = 100.0,
) -> DataFrame:
    """(key, ts, value, trend, seasonal, residual) for every observation
    with a FULL centered ±half_window frame (edge rows have no unbiased
    trend estimate and are dropped, the standard moving-average
    convention). Phase = hour-of-day of the observation.

    All three components derive from two exact integer partials: the
    centered window sum ``tnum`` (trend = tnum / (W·scale)) and the
    per-(key, phase) sum/count of the W-scaled detrended integer
    ``d = v·W − tnum`` (seasonal = Σd / (cnt·W·scale)); residual is the
    same fixed float sequence ``v/scale − trend − seasonal``. Non-finite
    values quantize to NULL and are excluded (a NULL in the frame voids
    the full-window requirement via the count check, never silently
    shrinks the mean)."""
    w_dim = 2 * half_window + 1
    fr = (
        Window.partitionBy(key)
        .orderBy(ts)
        .rowsBetween(-half_window, half_window)
    )
    v = quantize_fixed(F.col(value_col), scale)
    q = obs.select(key, ts, value_col, v.alias("_v"))
    staged = q.select(
        key,
        ts,
        value_col,
        "_v",
        F.sum("_v").over(fr).alias("_tnum"),
        F.count("_v").over(fr).alias("_nwin"),
        F.hour(F.col(ts)).alias("_phase"),
    ).where((F.col("_nwin") == w_dim) & F.col("_v").isNotNull())
    # W-scaled detrended value: v*W - tnum, exact int64
    d = (F.col("_v") * F.lit(w_dim) - F.col("_tnum")).alias("_d")
    staged = staged.select("*", d)
    seas = staged.groupBy(key, "_phase").agg(
        F.sum("_d").alias("_snum"), F.count("_d").alias("_scnt")
    )
    j = staged.join(seas, [key, "_phase"])
    denom = float(w_dim) * scale
    trend = F.col("_tnum").cast("double") / F.lit(denom)
    seasonal = F.col("_snum").cast("double") / (
        F.col("_scnt").cast("double") * F.lit(denom)
    )
    value_q = F.col("_v").cast("double") / F.lit(scale)

    def r4(x):
        # floor(x*1e4 + 0.5)/1e4, NOT round(x, 4): the three-term float
        # expression can land exactly on a .00005 half-point where Spark
        # (BigDecimal HALF_UP) and DuckDB (scaled-double) round apart;
        # floor of the identical double is identical on every engine
        return F.floor(x * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)

    return j.select(
        key,
        ts,
        value_col,
        r4(trend).alias("trend"),
        r4(seasonal).alias("seasonal"),
        r4(value_q - trend - seasonal).alias("residual"),
    )
