"""Planted-parameter recovery tests for the round-5 Kalman estimation
family (moments q/r, EM step, adaptive filter)."""

from __future__ import annotations

import numpy as np
import pytest


Q_TRUE, R_TRUE = 0.25, 1.5


@pytest.fixture(scope="module")
def planted(spark):
    """60 keys x 400 obs of a local-level model with known (q, r)."""
    rng = np.random.default_rng(7)
    rows = []
    base = np.datetime64("2024-01-01T00:00:00")
    for k in range(60):
        x = rng.normal(0, 1)
        for t in range(400):
            x += rng.normal(0, np.sqrt(Q_TRUE))
            y = x + rng.normal(0, np.sqrt(R_TRUE))
            rows.append((f"u{k:03d}", base + np.timedelta64(t, "h"), float(y)))
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    return spark.createDataFrame(pdf)


def test_moments_recovers_planted_qr(planted):
    from mintpy_spark.operators.kalman import kalman_qr_moments

    out = kalman_qr_moments(planted, "value", key="user_id", ts="ts").toPandas()
    assert len(out) == 60
    q_med = np.median(out["q_hat_e4"]) / 1e4
    r_med = np.median(out["r_hat_e4"]) / 1e4
    # moments estimator is unbiased; medians over 60 keys x 400 obs land
    # well within 25% of truth
    assert abs(q_med - Q_TRUE) < 0.25 * Q_TRUE
    assert abs(r_med - R_TRUE) < 0.25 * R_TRUE


def test_em_step_moves_toward_planted_qr(planted):
    """Starting far from truth (q0=0.04, r0=1.0), one EM iteration must
    move both parameters toward the planted values for most keys."""
    from mintpy_spark.operators.kalman import kalman_em_stats

    q0, r0 = 0.04, 1.0
    out = kalman_em_stats(
        planted, "value", key="user_id", ts="ts", q0=q0, r0=r0
    ).toPandas()
    assert len(out) == 60
    q1 = out["q1_e4"].to_numpy() / 1e4
    r1 = out["r1_e4"].to_numpy() / 1e4
    # q must increase from 0.04 toward 0.25; r from 1.0 toward 1.5
    assert (q1 > q0).mean() > 0.9
    assert (r1 > r0).mean() > 0.9
    # and the medians land strictly closer to truth than the start
    assert abs(np.median(q1) - Q_TRUE) < abs(q0 - Q_TRUE)
    assert abs(np.median(r1) - R_TRUE) < abs(r0 - R_TRUE)


def test_adaptive_filter_tracks_with_estimated_params(planted):
    """The adaptive filter (per-key estimated q, r) must reduce noise:
    filtered-level residual vs observation variance shrinks."""
    from mintpy_spark.operators.kalman import kalman_level_adaptive

    out = kalman_level_adaptive(
        planted, "value", key="user_id", ts="ts"
    ).toPandas()
    assert len(out) == 60 * 400
    assert out.groupby("user_id")["rn"].max().eq(400).all()
    # level is a smoothed version: lag-1 diffs of the level are smaller
    # than lag-1 diffs of raw y (which include 2r of observation noise)
    lvl = out.sort_values(["user_id", "rn"])["level"].to_numpy().reshape(60, 400)
    dl = np.diff(lvl, axis=1)
    assert dl.var() < Q_TRUE + 2 * R_TRUE  # raw diff variance = q + 2r
    assert dl.var() > 0.01  # but it does track, not flatline


def test_em_stats_matches_bruteforce_numpy(planted):
    """Bit-level check of the seam path against a direct per-key numpy
    replay of the documented recursions (one key suffices)."""
    import math

    from mintpy_spark.operators.kalman import kalman_em_stats

    q0, r0 = 0.04, 1.0
    one = planted.where("user_id = 'u007'")
    got = kalman_em_stats(one, "value", key="user_id", ts="ts", q0=q0, r0=r0)
    row = got.collect()[0]

    pdf = one.orderBy("ts", "value").toPandas()
    ys = pdf["value"].astype(float).tolist()
    n = len(ys)
    p = [r0]
    for _ in range(1, n):
        pp = p[-1] + q0
        kg = pp / (pp + r0)
        p.append((1.0 - kg) * pp)
    j = [p[t] / (p[t] + q0) for t in range(n - 1)]
    vs = [0.0] * n
    vs[n - 1] = p[n - 1]
    for t in range(n - 2, -1, -1):
        vs[t] = p[t] + j[t] * j[t] * (vs[t + 1] - (p[t] + q0))
    m = [ys[0]]
    for t in range(1, n):
        pp = p[t - 1] + q0
        kg = pp / (pp + r0)
        m.append(m[-1] + kg * (ys[t] - m[-1]))
    ms = [0.0] * n
    ms[n - 1] = m[n - 1]
    for t in range(n - 2, -1, -1):
        ms[t] = m[t] + j[t] * (ms[t + 1] - m[t])
    sr = sum(
        math.floor(((ys[t] - ms[t]) * (ys[t] - ms[t]) + vs[t]) * 1e6)
        for t in range(n)
    )
    sq = sum(
        math.floor(
            (
                (ms[t] - ms[t - 1]) * (ms[t] - ms[t - 1])
                + vs[t]
                + vs[t - 1]
                - 2.0 * (j[t - 1] * vs[t])
            )
            * 1e6
        )
        for t in range(1, n)
    )
    assert row["n"] == n
    assert row["sum_r_e6"] == sr
    assert row["sum_q_e6"] == sq
