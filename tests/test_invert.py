"""Network LS inversion vs NumPy oracles (reference estimate_timeseries,
ifgram_inversion.py:91-227 — simulate-network-then-invert, the reference's
own test pattern)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from mintpy_spark.operators.invert import network_invert


def _network(rng, n_dates=12, lags=(1, 2, 3), noise=0.0, drop=0):
    dates = pd.date_range("2024-01-01", periods=n_dates, freq="7D")
    series = np.cumsum(rng.normal(0, 2.0, n_dates))
    series -= series[0]
    rows = []
    for lag in lags:
        for i in range(n_dates - lag):
            d = series[i + lag] - series[i] + rng.normal(0, noise)
            rows.append((dates[i], dates[i + lag], d))
    pdf = pd.DataFrame(rows, columns=["ts1", "ts2", "delta"])
    if drop:
        pdf = pdf.sample(len(pdf) - drop, random_state=1).reset_index(drop=True)
    return dates, series, pdf


def _numpy_solve(dates, pdf, w=None):
    idx = {d: i for i, d in enumerate(dates)}
    A = np.zeros((len(pdf), len(dates)))
    r = np.arange(len(pdf))
    A[r, [idx[d] for d in pdf["ts1"]]] = -1.0
    A[r, [idx[d] for d in pdf["ts2"]]] = 1.0
    A = A[:, 1:]
    d = pdf["delta"].to_numpy()
    if w is not None:
        ws = np.sqrt(w)
        return np.linalg.lstsq(A * ws[:, None], d * ws, rcond=None)[0]
    return np.linalg.lstsq(A, d, rcond=None)[0]


def test_consistent_network_recovers_series_exactly(spark):
    rng = np.random.default_rng(2)
    dates, series, pdf = _network(rng, noise=0.0)
    pdf["url"] = "u0"
    out = (
        network_invert(spark.createDataFrame(pdf))
        .orderBy("ts")
        .toPandas()
    )
    assert np.allclose(out["value"], series, atol=1e-9)
    assert (out["coherence"] > 0.999999).all()
    assert out["num_dates"].iloc[0] == len(dates)


def test_noisy_dropped_network_matches_numpy_lstsq(spark):
    rng = np.random.default_rng(3)
    dates, _series, pdf = _network(rng, noise=0.5, drop=5)
    pdf["url"] = "u0"
    expect = np.concatenate([[0.0], _numpy_solve(dates, pdf)])
    out = network_invert(spark.createDataFrame(pdf)).orderBy("ts").toPandas()
    assert np.allclose(out["value"], expect, atol=1e-9)
    assert (out["coherence"] < 1.0).all()  # residuals exist


def test_weighted_inversion_matches_numpy(spark):
    rng = np.random.default_rng(4)
    dates, _series, pdf = _network(rng, noise=1.0)
    pdf["url"] = "u0"
    pdf["w"] = rng.uniform(0.2, 4.0, len(pdf))
    expect = np.concatenate(
        [[0.0], _numpy_solve(dates, pdf, w=pdf["w"].to_numpy())]
    )
    out = (
        network_invert(spark.createDataFrame(pdf), weight_col="w")
        .orderBy("ts")
        .toPandas()
    )
    assert np.allclose(out["value"], expect, atol=1e-9)


def test_multiple_keys_independent(spark):
    rng = np.random.default_rng(5)
    frames = []
    truths = {}
    for k in range(4):
        dates, series, pdf = _network(rng, n_dates=8, noise=0.0)
        pdf["url"] = f"u{k}"
        truths[f"u{k}"] = series
        frames.append(pdf)
    allp = pd.concat(frames, ignore_index=True)
    out = network_invert(spark.createDataFrame(allp)).toPandas()
    for k, series in truths.items():
        got = out[out["url"] == k].sort_values("ts")["value"].to_numpy()
        assert np.allclose(got, series, atol=1e-9)


def test_sigma_propagation_matches_numpy(spark):
    """value_std == sqrt(diag(Aplus diag(s^2) Aplus')) — the reference's
    estimate_timeseries_cov (ifgram_inversion.py:230-265)."""
    rng = np.random.default_rng(6)
    dates, _series, pdf = _network(rng, noise=0.3)
    pdf["url"] = "u0"
    pdf["sig"] = rng.uniform(0.1, 2.0, len(pdf))
    idx = {d: i for i, d in enumerate(dates)}
    A = np.zeros((len(pdf), len(dates)))
    r = np.arange(len(pdf))
    A[r, [idx[d] for d in pdf["ts1"]]] = -1.0
    A[r, [idx[d] for d in pdf["ts2"]]] = 1.0
    A = A[:, 1:]
    Aplus = np.linalg.pinv(A)
    cov = Aplus @ np.diag(pdf["sig"].to_numpy() ** 2) @ Aplus.T
    expect = np.concatenate([[0.0], np.sqrt(np.diag(cov))])
    out = (
        network_invert(spark.createDataFrame(pdf), sigma_col="sig")
        .orderBy("ts")
        .toPandas()
    )
    assert np.allclose(out["value_std"], expect, atol=1e-9)


def test_null_delta_dropped_not_poisoning(spark):
    """One NULL pair must be skipped (skip_invalid_obs), not NaN the key."""
    rng = np.random.default_rng(7)
    dates, series, pdf = _network(rng, n_dates=8, noise=0.0)
    pdf["url"] = "u0"
    pdf.loc[2, "delta"] = None
    out = network_invert(spark.createDataFrame(pdf)).orderBy("ts").toPandas()
    assert not out["value"].isna().any()
    # lag-1..3 network stays connected after one drop -> still exact
    assert np.allclose(out["value"], series, atol=1e-9)


def test_min_redundancy_masks_weak_network(spark):
    """A chain network (1 pair per interval) fails min_redundancy=2 and
    emits NULL values with coherence 0 (the reference's skip path)."""
    rng = np.random.default_rng(8)
    _dates, _series, pdf = _network(rng, n_dates=6, lags=(1,), noise=0.0)
    pdf["url"] = "u0"
    out = network_invert(
        spark.createDataFrame(pdf), min_redundancy=2
    ).toPandas()
    assert out["value"].isna().all()
    assert (out["coherence"] == 0.0).all()
    # the redundant (lags 1-3) network passes the same threshold
    _d2, series2, pdf2 = _network(rng, n_dates=6, noise=0.0)
    pdf2["url"] = "u0"
    out2 = (
        network_invert(spark.createDataFrame(pdf2), min_redundancy=2)
        .orderBy("ts").toPandas()
    )
    assert np.allclose(out2["value"], series2, atol=1e-9)

def test_disconnected_network_falls_back_to_min_norm(spark):
    """Two disjoint chains in one key: union-find routes the solve to the
    dense lstsq fallback, whose minimum-norm solution must match numpy's."""
    rng = np.random.default_rng(7)
    dates = pd.date_range("2024-01-01", periods=8, freq="7D")
    rows = []
    for i in (0, 1, 2):  # component A: dates 0-3 chain
        rows.append((dates[i], dates[i + 1], float(i + 1)))
    for i in (4, 5, 6):  # component B: dates 4-7 chain (no link to A)
        rows.append((dates[i], dates[i + 1], float(10 * i)))
    pdf = pd.DataFrame(rows, columns=["ts1", "ts2", "delta"])
    pdf["url"] = "u0"
    out = network_invert(spark.createDataFrame(pdf)).orderBy("ts").toPandas()
    expect = _numpy_solve(dates, pdf)
    assert np.allclose(out["value"].to_numpy()[1:], expect, atol=1e-9)
    assert out["value"].iloc[0] == 0.0


def test_laplacian_fast_path_matches_lstsq_weighted(spark):
    """Connected weighted network: the Laplacian normal-equation fast path
    must reproduce the dense weighted lstsq solution to float precision."""
    rng = np.random.default_rng(11)
    dates, _series, pdf = _network(rng, n_dates=20, noise=0.8, drop=7)
    w = rng.uniform(0.2, 5.0, len(pdf))
    pdf["w"] = w
    pdf["url"] = "u0"
    out = (
        network_invert(spark.createDataFrame(pdf), weight_col="w")
        .orderBy("ts")
        .toPandas()
    )
    expect = _numpy_solve(dates, pdf, w=w)
    assert np.allclose(out["value"].to_numpy()[1:], expect, atol=1e-8)


def test_zero_weight_bridge_falls_back_to_min_norm(spark):
    """A zero-weight pair is an edge for union-find but contributes
    nothing to the weighted Laplacian — the normal-equation system is
    exactly singular and the solve must fall back to dense lstsq, whose
    min-norm solution numpy reproduces."""
    dates = pd.date_range("2024-01-01", periods=6, freq="7D")
    rows = []
    for i in (0, 1):       # component A chain
        rows.append((dates[i], dates[i + 1], 1.0, 2.0))
    for i in (3, 4):       # component B chain
        rows.append((dates[i], dates[i + 1], 2.0, 3.0))
    rows.append((dates[2], dates[3], 5.0, 0.0))  # zero-weight bridge
    pdf = pd.DataFrame(rows, columns=["ts1", "ts2", "delta", "w"])
    rows2 = [(dates[1], dates[2], 1.5, 1.0)]     # connect A fully
    pdf = pd.concat(
        [pdf, pd.DataFrame(rows2, columns=pdf.columns)], ignore_index=True
    )
    pdf["url"] = "u0"
    out = (
        network_invert(spark.createDataFrame(pdf), weight_col="w")
        .orderBy("ts")
        .toPandas()
    )
    expect = _numpy_solve(dates, pdf, w=pdf["w"].to_numpy())
    assert np.allclose(out["value"].to_numpy()[1:], expect, atol=1e-8)


def test_batched_matches_per_key_path(spark):
    """The structure-cohort batched path (default) must reproduce the
    per-key path (forced via sigma_col) exactly — across mixed network
    structures in one bucket, a NULL key, a disconnected network
    (min-norm lstsq), and a below-redundancy key (NaN rows)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    # three keys sharing a lag-1+2 chain structure (one cohort), one of
    # them the NULL key
    for u in (1, 2, None):
        for i in range(4):
            for lag in (1, 2):
                if i + lag <= 4:
                    rows.append(
                        (u, base + dt.timedelta(days=i),
                         base + dt.timedelta(days=i + lag),
                         float((i + lag) ** 2 - i * i), 1.0)
                    )
    # a key with a DIFFERENT structure (plain chain, 3 dates)
    for i in range(2):
        rows.append((7, base + dt.timedelta(days=i),
                     base + dt.timedelta(days=i + 1), 1.0, 1.0))
    # a disconnected network: two chains with no bridge — each edge
    # doubled so every date clears min_redundancy=2 (redundancy counts
    # pair touches, not connectivity)
    rows += [
        (8, base, base + dt.timedelta(days=1), 1.0, 1.0),
        (8, base, base + dt.timedelta(days=1), 1.2, 1.0),
        (8, base + dt.timedelta(days=3), base + dt.timedelta(days=4), 2.0, 1.0),
        (8, base + dt.timedelta(days=3), base + dt.timedelta(days=4), 2.2, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts1 timestamp, ts2 timestamp, delta double, sig double"
    )
    kw = dict(key="user_id", ts1="ts1", ts2="ts2")
    bat = (network_invert(df, **kw, min_redundancy=2)
           .orderBy("user_id", "ts").toPandas())
    per = (network_invert(df, **kw, min_redundancy=2, sigma_col="sig")
           .orderBy("user_id", "ts").toPandas().drop(columns=["value_std"]))
    assert len(bat) == len(per) > 0
    pd.testing.assert_frame_equal(
        bat.reset_index(drop=True), per.reset_index(drop=True),
        check_exact=False, atol=1e-9,
    )
    # key 7 (chain, redundancy 1 < 2) must be NaN-valued in BOTH paths
    assert bat[bat.user_id == 7]["value"].isna().all()
    # key 8 (disconnected) gets the min-norm solution, non-NaN
    assert bat[bat.user_id == 8]["value"].notna().all()
