"""Truth-recovery tests for the time-function regression — the engine's
timeseries2velocity analog, mirroring the reference's simulate-then-recover
unit tests (tests/dem_error.py:56-80)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from mintpy_spark.datagen import gen_truth
from mintpy_spark.operators.timefunc import (
    design_matrix,
    fit_time_func,
    linear_velocity,
    param_names,
)


def test_velocity_within_4_sigma(spark, obs):
    truth = gen_truth(spark, num_urls=80).select(
        "url", F.col("velocity").alias("true_vel"), "step"
    )
    fit = fit_time_func(obs, "text_length", {"polynomial": 1, "periodic": [1.0]})
    j = (
        fit.select("url", "velocity", "velocity_std")
        .join(truth, "url")
        .where(F.col("step") == 0.0)  # model family matches truth exactly
        .toPandas()
    )
    assert len(j) > 10
    resid = np.abs(j["velocity"] - j["true_vel"])
    assert (resid <= 4.0 * j["velocity_std"] + 1e-9).all()


def test_step_recovery(spark, obs):
    """Fitting with the true step date recovers the step amplitude."""
    truth = gen_truth(spark, num_urls=80).toPandas()
    stepped = truth[truth["step"] != 0.0]
    assert len(stepped) > 3
    # fit each stepped url with its own true onset (grouped by onset value)
    for _, row in stepped.head(5).iterrows():
        one = obs.where(F.col("url") == row["url"])
        fit = fit_time_func(
            one,
            "text_length",
            {"polynomial": 1, "periodic": [1.0], "step": [row["step_year"]]},
        ).toPandas()
        est = fit["step0"].iloc[0]
        std = fit["step0_std"].iloc[0]
        assert abs(est - row["step"]) <= max(4.0 * std, 2.0)


def test_closed_form_equals_lstsq(spark, obs):
    lv = linear_velocity(obs, "text_length")
    f1 = fit_time_func(obs, "text_length", {"polynomial": 1}).select(
        "url", F.col("velocity").alias("v2")
    )
    d = (
        lv.join(f1, "url")
        .agg(F.max(F.abs(F.col("velocity") - F.col("v2"))).alias("m"))
        .collect()[0]["m"]
    )
    assert d < 1e-4


def test_design_matrix_shapes_and_names():
    model = {
        "polynomial": 2,
        "periodic": [1.0, 0.5],
        "step": [2023.5],
        "exp": {2023.4: [60.0]},
        "log": {2023.3: [80.0, 160.0]},
    }
    names = param_names(model)
    dy = np.linspace(2023.0, 2024.0, 50)
    G = design_matrix(dy, model, ref_year=2023.0)
    assert G.shape == (50, len(names))
    assert G.dtype == np.float32
    # poly col 0 is ones; step col is 0 before onset and 1 after
    assert np.allclose(G[:, 0], 1.0)
    step_col = names.index("step0")
    assert G[0, step_col] == 0.0 and G[-1, step_col] == 1.0
    # quadratic column is t^2/2 (Taylor scaling, time_func.py:293-312)
    acc = names.index("acceleration")
    assert np.allclose(G[:, acc], ((dy - 2023.0) ** 2) / 2.0, atol=1e-6)


def test_wls_bootstrap_matches_numpy_replica(spark):
    """WLS + bootstrap combined (the previously untested pairing): the
    engine must resample weights with the SAME indices as the data. Verified
    against an exact NumPy replica of the per-key Philox stream + weighted
    lstsq."""
    import hashlib

    import pandas as pd

    from mintpy_spark.operators.timefunc import _decimal_year_np

    rng0 = np.random.default_rng(7)
    n, reps = 40, 50
    ts = pd.date_range("2023-01-01", periods=n, freq="9D")
    dy = _decimal_year_np(pd.Series(ts))
    v = (100 + 55.0 * (dy - dy[0]) + rng0.normal(0, 3.0, n)).astype(np.float32)
    w = rng0.uniform(0.1, 5.0, n)
    pdf = pd.DataFrame({"url": "u0", "warc_ts": ts, "text_length": v, "w": w})
    out = (
        fit_time_func(
            spark.createDataFrame(pdf), "text_length", {"polynomial": 1},
            weight_col="w", uncertainty="bootstrap", bootstrap_count=reps,
        )
        .toPandas().iloc[0]
    )
    # exact replica: same seed scheme, same resampling, weights at [idx]
    G = design_matrix(dy, {"polynomial": 1}, float(dy[0]))
    wsqrt = np.sqrt(w)
    kid = int(hashlib.md5(b"u0").hexdigest()[:8], 16)
    rng = np.random.Generator(np.random.Philox(key=12138, counter=[kid, 0, 0, 0]))
    boots = np.empty((reps, 2))
    for b in range(reps):
        idx = rng.integers(0, n, size=n)
        Gw = G[idx].astype(np.float64) * wsqrt[idx][:, None]
        dw = v[idx].astype(np.float64) * wsqrt[idx]
        boots[b] = np.linalg.lstsq(Gw, dw, rcond=None)[0]
    expect = boots.std(axis=0, ddof=1)
    assert abs(out["velocity_std"] - expect[1]) < 1e-8
    assert abs(out["intercept_std"] - expect[0]) < 1e-8


def test_insufficient_obs_yields_nulls(spark):
    import pandas as pd

    one = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u"],
                "warc_ts": [pd.Timestamp("2023-01-01")],
                "text_length": [100],
            }
        )
    )
    out = fit_time_func(one, "text_length", {"polynomial": 1}).collect()[0]
    assert out["velocity"] is None and out["num_obs"] == 1


def test_extra_cols_recovers_geometry_coefficient(spark):
    """DEM-error pattern (dem_error.py:137-171; test model tests/
    dem_error.py:59-67): seed a per-observation regressor term, fit with
    extra_cols, recover its coefficient."""
    import pandas as pd

    from mintpy_spark.operators.timefunc import _decimal_year_np

    rng = np.random.default_rng(5)
    rows = []
    truth = {}
    for k in range(8):
        n = 60
        ts = pd.date_range("2023-01-01", periods=n, freq="6D")
        dy = _decimal_year_np(pd.Series(ts))
        bperp = rng.uniform(-120, 120, n)
        vel, coef = rng.uniform(-40, 40), rng.uniform(-0.5, 0.5)
        truth[f"u{k}"] = (vel, coef)
        v = 50 + vel * (dy - dy[0]) + coef * bperp + rng.normal(0, 0.01, n)
        for t, b, val in zip(ts, bperp, v):
            rows.append((f"u{k}", t, float(val), float(b)))
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "text_length", "bperp"])
    out = (
        fit_time_func(
            spark.createDataFrame(pdf), "text_length", {"polynomial": 1},
            extra_cols=["bperp"], dtype=np.float64,
        )
        .toPandas().set_index("url")
    )
    for k, (vel, coef) in truth.items():
        assert abs(out.loc[k, "velocity"] - vel) < 0.05
        assert abs(out.loc[k, "bperp"] - coef) < 1e-3


def test_covariance_uncertainty_matches_numpy_propagation(spark):
    """uncertainty='covariance' == sqrt(diag(Gplus @ diag(s^2) @ Gplus.T))
    (timeseries2velocity.py:377-402); with w = 1/s^2 it equals the
    closed-form (G' W G)^-1 diagonal."""
    import pandas as pd

    from mintpy_spark.operators.timefunc import _decimal_year_np

    rng = np.random.default_rng(9)
    n = 30
    ts = pd.date_range("2023-01-01", periods=n, freq="12D")
    dy = _decimal_year_np(pd.Series(ts))
    sig = rng.uniform(0.5, 3.0, n)
    v = 10 + 5 * (dy - dy[0]) + rng.normal(0, sig)
    pdf = pd.DataFrame(
        {"url": "u0", "warc_ts": ts, "text_length": v, "sig": sig,
         "w": 1.0 / sig**2}
    )
    df = spark.createDataFrame(pdf)
    # unweighted propagation
    row = fit_time_func(
        df, "text_length", {"polynomial": 1}, sigma_col="sig",
        uncertainty="covariance", dtype=np.float64,
    ).collect()[0]
    G = design_matrix(dy, {"polynomial": 1}, float(dy[0]), dtype=np.float64)
    Gplus = np.linalg.pinv(G)
    m_cov = Gplus @ np.diag(sig**2) @ Gplus.T
    expect = np.sqrt(np.diag(m_cov))
    assert abs(row["intercept_std"] - expect[0]) < 1e-9
    assert abs(row["velocity_std"] - expect[1]) < 1e-9
    # weighted with w = 1/s^2 -> (G' W G)^-1
    row_w = fit_time_func(
        df, "text_length", {"polynomial": 1}, sigma_col="sig", weight_col="w",
        uncertainty="covariance", dtype=np.float64,
    ).collect()[0]
    GtWG_inv = np.linalg.inv(G.T @ np.diag(1.0 / sig**2) @ G)
    expect_w = np.sqrt(np.diag(GtWG_inv))
    assert abs(row_w["intercept_std"] - expect_w[0]) < 1e-8
    assert abs(row_w["velocity_std"] - expect_w[1]) < 1e-8
