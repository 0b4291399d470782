"""Kalman local-level filtering (online exponential-family smoother).

Reference analog: the temporal-filter family (`tsview`/`temporal_filter`
moving averages, src/mintpy/utils/time_func.py smoothing uses) — the
Kalman local-level model is the online counterpart: a random-walk level
observed under noise, filtered causally in one forward pass. Unlike the
window filters in operators/filters.py it needs no look-ahead and its
gain adapts during warm-up, which is what a streaming tier-maintenance
loop wants for live smoothing.

Model (constant hyperparameters q = process variance, r = observation
variance), initialized at the first observation with prior variance r:

    pp = p + q
    k  = pp / (pp + r)
    m  = m + k * (y - m)
    p  = (1 - k) * pp

The recursion is evaluated with scalar IEEE doubles in EXACTLY this
operation order — the DuckDB oracle (a recursive CTE) writes the same
expressions term-for-term, so filtered levels match bit-for-bit and the
driver's floor-quantized hash is stable.

Scale: one shuffle (repartition by key + partition-local sort), then
mapInPandas over key-clustered partitions — one Arrow frame per chunk,
NOT one per key: grouped applyInPandas pays pandas frame construction
per key, which dominated wall time 6.8x at sf0.1 (5.0 s -> 0.73 s) and
dominates harder at production shape (10^9 keys x ~10^2 rows). The
per-key pass is O(n) with O(1) state, the same access pattern the
streaming variant carries in its state store.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kalman_level(
    df: DataFrame,
    value_col: str = "value",
    key: str = "user_id",
    ts: str = "ts",
    q: float = 0.04,
    r: float = 1.0,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-key causal Kalman local-level filter. Returns one row per
    observation: (key, rn, level) where rn is the 1-based position in
    (ts, value, *order_cols) order — the value tie-break keeps duplicate
    timestamps deterministic (ADVICE r3 ordering convention) — and level
    the filtered mean after seeing observation rn. NULL observations are
    dropped before ranking (they carry no update)."""
    qq, rr = float(q), float(r)
    src = df.where(F.col(value_col).isNotNull()).select(
        F.col(key).alias("k"),
        F.col(ts).alias("t"),
        *[F.col(c) for c in order_cols],
        F.col(value_col).cast("double").alias("y"),
    )
    order = ["t", "y", *order_cols]
    schema = f"k {dict(src.dtypes)['k']}, rn long, level double"

    # the variance/gain recursion is data-independent, so the gain
    # sequence is shared by every key of the same length — cache it per
    # executor (values are IDENTICAL to inline computation: same ops,
    # same order, just computed once)
    gain_cache: dict[int, list[float]] = {}

    def gains(n: int) -> list[float]:
        ks = gain_cache.get(n)
        if ks is None:
            base = max(gain_cache, default=0)
            if base and base < n:
                ks = gain_cache[base][:]
                p = gain_cache[-base]  # trailing variance of the prefix
            else:
                ks, p = [], rr
            for _ in range(len(ks), n - 1):
                pp = p + qq
                k = pp / (pp + rr)
                p = (1.0 - k) * pp
                ks.append(k)
            gain_cache[n] = ks
            gain_cache[-n] = p
        return ks

    def run_sorted(pdf: pd.DataFrame) -> pd.DataFrame:
        """One or more WHOLE key groups, already in (k, t, y) order."""
        out_k: list = []
        out_rn: list[int] = []
        out_lv: list[float] = []
        for kval, g in pdf.groupby("k", sort=False):
            ys = g["y"].tolist()
            m = ys[0]
            levels = [m]
            for y, k in zip(ys[1:], gains(len(ys))):
                m = m + k * (y - m)
                levels.append(m)
            out_k.extend([kval] * len(ys))
            out_rn.extend(range(1, len(ys) + 1))
            out_lv.extend(levels)
        return pd.DataFrame({"k": out_k, "rn": out_rn, "level": out_lv})

    from mintpy_spark.operators.seqstate import map_sorted_groups

    return map_sorted_groups(src, "k", tuple(order), run_sorted, schema).select(
        F.col("k").alias(key), "rn", "level"
    )
