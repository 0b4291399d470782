"""Round-3 batch-d operators: rolling z-score anomalies and exact-integer
group correlation. Planted-truth and NumPy-replica checks beyond the
driver oracles."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def test_rolling_z_flags_planted_spike_only(spark):
    """A single 10-sigma spike in an otherwise calm series is flagged;
    nothing else is."""
    from mintpy_spark.operators.anomaly import rolling_zscore_anomalies

    rng = np.random.default_rng(7)
    t0 = dt.datetime(2024, 1, 1)
    vals = rng.normal(100.0, 2.0, size=60).round(2)
    vals[40] = 160.0  # planted spike, ~30 sigma
    rows = [(1, t0 + dt.timedelta(hours=i), float(v)) for i, v in enumerate(vals)]
    out = rolling_zscore_anomalies(
        _events(spark, rows), "value", lookback=12, min_obs=8, threshold=3
    ).collect()
    flagged = {r.ts for r in out}
    assert t0 + dt.timedelta(hours=40) in flagged
    # the spike itself plus at most noise-free neighbors; a calm gaussian
    # series at 3 sigma with 60 points should produce ~0 extra flags
    assert len(flagged) <= 2
    spike = [r for r in out if r.ts == t0 + dt.timedelta(hours=40)][0]
    assert spike.z > 10.0
    assert spike.n == 12


def test_rolling_z_matches_numpy_replica(spark):
    """Flag set and z values must equal a NumPy replica of the integer
    algebra (same quantization, same trailing frame)."""
    from mintpy_spark.operators.anomaly import rolling_zscore_anomalies

    rng = np.random.default_rng(11)
    t0 = dt.datetime(2024, 1, 1)
    vals = np.concatenate(
        [rng.normal(50.0, 5.0, 40), rng.normal(50.0, 5.0, 40) + 60.0]
    ).round(2)
    rows = [(1, t0 + dt.timedelta(hours=i), float(v)) for i, v in enumerate(vals)]
    lookback, min_obs, thr = 12, 8, 3

    v = np.floor(vals * 100.0 + 0.5).astype(np.int64)
    expect = {}
    for i in range(len(v)):
        lo = max(0, i - lookback)
        w = v[lo:i]
        n = len(w)
        if n < min_obs:
            continue
        s1, s2 = int(w.sum()), int((w.astype(object) ** 2).sum())
        nvar = n * s2 - s1 * s1
        dev = int(v[i]) * n - s1
        if nvar <= 0 or not (dev * dev * (n - 1) > thr * thr * n * nvar):
            continue
        z = dev / np.sqrt(n * nvar / (n - 1))
        expect[i] = (n, dev, round(float(z), 4))

    out = rolling_zscore_anomalies(
        _events(spark, rows), "value", lookback=lookback, min_obs=min_obs,
        threshold=thr,
    ).collect()
    got = {
        int((r.ts - t0).total_seconds() // 3600): (r.n, r.dev, r.z) for r in out
    }
    assert got == expect
    assert len(expect) >= 1  # the regime shift must actually trip the monitor


def test_rolling_z_constant_window_never_flags(spark):
    """Zero window variance -> no flag, even for a huge jump (no scale to
    judge against)."""
    from mintpy_spark.operators.anomaly import rolling_zscore_anomalies

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0 + dt.timedelta(hours=i), 5.0) for i in range(20)]
    rows.append((1, t0 + dt.timedelta(hours=20), 500.0))
    out = rolling_zscore_anomalies(_events(spark, rows), "value").collect()
    assert out == []


def test_exact_group_corr_matches_numpy(spark):
    """corr of correlated/anticorrelated/independent integer metrics per
    group matches np.corrcoef to the rounded digit."""
    from mintpy_spark.operators.anomaly import exact_group_corr

    rng = np.random.default_rng(3)
    rows = []
    xs = rng.integers(10, 500, size=50)
    for g, ys in (
        ("pos", xs * 2 + rng.integers(0, 20, 50)),
        ("neg", 1000 - xs + rng.integers(0, 20, 50)),
        ("ind", rng.integers(10, 500, size=50)),
    ):
        rows += [(g, int(x), int(y)) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {
        r.g: r for r in exact_group_corr(df, F.col("x"), F.col("y"), "g").collect()
    }
    for g in ("pos", "neg", "ind"):
        xa = np.array([x for gg, x, y in rows if gg == g], dtype=np.float64)
        ya = np.array([y for gg, x, y in rows if gg == g], dtype=np.float64)
        assert abs(out[g].corr - round(float(np.corrcoef(xa, ya)[0, 1]), 4)) <= 1e-4
        assert out[g].n == 50
    assert out["pos"].corr > 0.99 and out["neg"].corr < -0.97


def test_exact_group_corr_decimal_path_matches_int64(spark):
    """The DECIMAL(38,0) escalation (for >5M-row groups at scale) must
    produce the identical rounded corr on data the int64 path covers."""
    from mintpy_spark.operators.anomaly import exact_group_corr

    rng = np.random.default_rng(9)
    rows = [
        ("g", int(x), int(x * 3 + e))
        for x, e in zip(rng.integers(1, 10**6, 40), rng.integers(0, 10**5, 40))
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    a = exact_group_corr(df, F.col("x"), F.col("y"), "g").first()
    b = exact_group_corr(df, F.col("x"), F.col("y"), "g", use_decimal=True).first()
    assert a.corr == b.corr and a.n == b.n
    assert int(a.corr_num) == int(b.corr_num)


def test_exact_group_corr_drops_degenerate_groups(spark):
    """Constant-metric and too-small groups are dropped (corr undefined)."""
    from mintpy_spark.operators.anomaly import exact_group_corr

    rows = (
        [("const", 5, i) for i in range(10)]
        + [("tiny", 1, 2), ("tiny", 3, 4)]
        + [("ok", i, i * 3 + 1) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = exact_group_corr(df, F.col("x"), F.col("y"), "g", min_n=3).collect()
    assert {r.g for r in out} == {"ok"}
    assert out[0].corr == 1.0


def test_quantize_nan_is_null_and_matches_streaming(spark):
    """Review fix: NaN quantizes to NULL (a frame slot the aggregates
    skip), never to 0 — matching the streaming twin's math.isnan skip."""
    from mintpy_spark.operators.anomaly import quantize_fixed, rolling_zscore_anomalies

    t0 = dt.datetime(2024, 1, 1)
    vals = [50.0 + (i % 5) for i in range(30)]
    vals[12] = float("nan")
    vals[25] = 500.0
    rows = [(1, t0 + dt.timedelta(hours=i), v) for i, v in enumerate(vals)]
    df = _events(spark, rows)
    q = {
        r.ts: r.v
        for r in df.select("ts", quantize_fixed(F.col("value")).alias("v")).collect()
    }
    assert q[rows[12][1]] is None and q[rows[0][1]] == 5000

    batch = rolling_zscore_anomalies(df, "value").collect()
    flagged = {r.ts for r in batch}
    assert rows[25][1] in flagged and rows[12][1] not in flagged
    # window partials must have SKIPPED the NaN slot: the window ending
    # just after it has n == 11 live values, not 12
    near = [r for r in batch if r.ts == rows[25][1]][0]
    assert near.n == 12  # NaN already rolled out of the 12-row frame by then


def test_rolling_z_large_magnitudes_stay_exact(spark):
    """Review fix: squared terms run in DECIMAL(38,0) — quantized values
    ~1e9 (10 MB text lengths at scale=100) must neither overflow-error
    (ANSI) nor wrap, and the planted spike is still the only flag."""
    from mintpy_spark.operators.anomaly import rolling_zscore_anomalies

    t0 = dt.datetime(2024, 1, 1)
    base = 1.0e7  # quantizes to 1e9 at scale=100
    vals = [base + (i % 7) * 10 for i in range(25)]
    vals[20] = base * 2
    rows = [(1, t0 + dt.timedelta(hours=i), float(v)) for i, v in enumerate(vals)]
    out = rolling_zscore_anomalies(_events(spark, rows), "value").collect()
    assert {r.ts for r in out} == {rows[20][1]}
    assert out[0].z > 100
