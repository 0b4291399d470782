"""Holt-Winters additive triple exponential smoothing (level + trend +
weekly seasonality), causal, with oracle-exact scalar recursion.

Reference analog: the time-function regression family
(operators/timefunc.py mirrors timeseries2velocity's model dict, which
fits annual/semi-annual periodic terms) — Holt-Winters is the online
counterpart: it tracks level, trend and a rotating additive seasonal
profile in one forward pass, no design matrix. The engine already ships
double smoothing (forecast_holt_mase, queries_r3n) and multiplicative
seasonal indexes (seasonal_index_dow); this completes the classic triad.

Recursion (period P, smoothing alpha/beta/gamma), initialized at the
first observation with zero trend and a zero seasonal profile:

    l' = alpha * (y - s_old) + (1 - alpha) * (l + b)
    b' = beta * (l' - l) + (1 - beta) * b
    s' = gamma * (y - l') + (1 - gamma) * s_old

where s_old is the seasonal slot written P steps earlier. As with the
Kalman filter (operators/kalman.py), the Python pass and the DuckDB
RECURSIVE-CTE oracle evaluate the identical expressions in the identical
order, so the state sequence matches bit-for-bit; inputs arrive as
integer cents cast to double so the daily pre-aggregation is
order-independent too.

Scale: one shuffle into the per-key Arrow seam; state is P + 2 doubles
per key (the streaming twin would keep the rotating profile in its state
store).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def holt_winters_additive(
    df: DataFrame,
    value_col: str,
    key: str = "user_id",
    ts: str = "bucket_start",
    period: int = 7,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
) -> DataFrame:
    """Per-key causal Holt-Winters pass over an already-bucketed series
    (one row per (key, bucket)). Returns (key, rn, level, trend,
    seasonal) after each observation in bucket order."""
    a, b_, g = float(alpha), float(beta), float(gamma)
    p = int(period)
    src = df.where(F.col(value_col).isNotNull()).select(
        F.col(key).alias("k"),
        F.col(ts).alias("t"),
        F.col(value_col).cast("double").alias("y"),
    )
    schema = (
        f"k {dict(src.dtypes)['k']}, rn long, level double, trend double,"
        " seasonal double"
    )

    def run_sorted(pdf: pd.DataFrame) -> pd.DataFrame:
        out_k: list = []
        out_rn: list[int] = []
        out_l: list[float] = []
        out_b: list[float] = []
        out_s: list[float] = []
        for kval, grp in pdf.groupby("k", sort=False):
            ys = grp["y"].tolist()
            season = [0.0] * p
            lev, tr = ys[0], 0.0
            out_k.extend([kval] * len(ys))
            out_rn.extend(range(1, len(ys) + 1))
            out_l.append(lev)
            out_b.append(tr)
            out_s.append(0.0)
            for i, y in enumerate(ys[1:], start=1):
                s_old = season[i % p]
                l_new = a * (y - s_old) + (1.0 - a) * (lev + tr)
                tr = b_ * (l_new - lev) + (1.0 - b_) * tr
                s_new = g * (y - l_new) + (1.0 - g) * s_old
                season[i % p] = s_new
                lev = l_new
                out_l.append(lev)
                out_b.append(tr)
                out_s.append(s_new)
        return pd.DataFrame(
            {
                "k": out_k,
                "rn": out_rn,
                "level": out_l,
                "trend": out_b,
                "seasonal": out_s,
            }
        )

    from mintpy_spark.operators.seqstate import map_sorted_groups

    return map_sorted_groups(
        src, "k", ("t", "y"), run_sorted, schema
    ).select(F.col("k").alias(key), "rn", "level", "trend", "seasonal")
