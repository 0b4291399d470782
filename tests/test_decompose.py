"""Truth-recovery tests for joint_decompose — the asc_desc2horz_vert
analog, mirroring the reference's round-trip test (tests/
asc_desc2horz_vert.py:40-60: project known horz/vert into two LOS
geometries, decompose, compare)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from mintpy_spark.operators.decompose import joint_decompose


def _project(rng, n_keys, thetas, obs_per_geom=3):
    """Known (horz, vert) per key -> observations through each geometry."""
    truth = {k: (rng.uniform(-5, 5), rng.uniform(-5, 5)) for k in range(n_keys)}
    rows = []
    for k, (hx, vy) in truth.items():
        for th in thetas:
            cx, cy = math.cos(th), math.sin(th)
            for _ in range(obs_per_geom):
                rows.append((f"u{k}", cx, cy, cx * hx + cy * vy))
    return truth, pd.DataFrame(rows, columns=["url", "cx", "cy", "d"])


def test_round_trip_recovers_truth(spark):
    rng = np.random.default_rng(42)
    truth, pdf = _project(rng, 25, thetas=[0.6, 1.9])
    out = (
        joint_decompose(spark.createDataFrame(pdf), "d", "cx", "cy")
        .toPandas()
        .set_index("url")
    )
    assert len(out) == 25
    for k, (hx, vy) in truth.items():
        row = out.loc[f"u{k}"]
        assert abs(row["horz"] - hx) < 1e-9
        assert abs(row["vert"] - vy) < 1e-9
        assert row["num_obs"] == 6


def test_single_geometry_is_singular(spark):
    """All observations along ONE direction -> rank-1 normal matrix ->
    NULL components (the reference masks pixels missing a geometry)."""
    rng = np.random.default_rng(1)
    _, pdf = _project(rng, 4, thetas=[0.6])
    out = joint_decompose(spark.createDataFrame(pdf), "d", "cx", "cy").toPandas()
    assert out["horz"].isna().all() and out["vert"].isna().all()


def test_two_exact_observations_match_pinv(spark):
    """With exactly one observation per geometry the LS solution equals the
    reference's pinv(G) @ dlos (asc_desc2horz_vert.py:106)."""
    thetas = [0.6, 1.9]
    G = np.array([[math.cos(t), math.sin(t)] for t in thetas])
    dlos = np.array([2.5, -1.25])
    expect = np.linalg.pinv(G) @ dlos
    pdf = pd.DataFrame(
        {
            "url": ["p", "p"],
            "cx": G[:, 0],
            "cy": G[:, 1],
            "d": dlos,
        }
    )
    row = joint_decompose(spark.createDataFrame(pdf), "d", "cx", "cy").collect()[0]
    assert abs(row["horz"] - expect[0]) < 1e-9
    assert abs(row["vert"] - expect[1]) < 1e-9


def test_null_observations_dropped(spark):
    pdf = pd.DataFrame(
        {
            "url": ["a"] * 4,
            "cx": [1.0, 0.0, 1.0, 0.5],
            "cy": [0.0, 1.0, 0.0, None],
            "d": [3.0, 4.0, 3.0, None],
        }
    )
    pdf.loc[3, "d"] = None
    row = joint_decompose(spark.createDataFrame(pdf), "d", "cx", "cy").collect()[0]
    assert row["num_obs"] == 3
    assert abs(row["horz"] - 3.0) < 1e-9 and abs(row["vert"] - 4.0) < 1e-9
