"""Round-4 batch h planted truth: the Holt-Winters recursion
hand-stepped, seasonal slot rotation, and trend recovery on a planted
linear+weekly series."""

from __future__ import annotations

import datetime as dt


def _steps(ys, a, b, g, p):
    season = [0.0] * p
    lev, tr = ys[0], 0.0
    out = [(lev, tr, 0.0)]
    for i, y in enumerate(ys[1:], start=1):
        s_old = season[i % p]
        l_new = a * (y - s_old) + (1.0 - a) * (lev + tr)
        tr = b * (l_new - lev) + (1.0 - b) * tr
        s_new = g * (y - l_new) + (1.0 - g) * s_old
        season[i % p] = s_new
        lev = l_new
        out.append((lev, tr, s_new))
    return out


def test_holt_winters_additive_planted(spark):
    from mintpy_spark.operators.holtwinters import holt_winters_additive

    t0 = dt.datetime(2024, 1, 1)
    ys = [10.0, 12.0, 9.0, 14.0, 11.0, 13.0, 10.0, 12.5, 11.5]
    df = spark.createDataFrame(
        [(1, t0 + dt.timedelta(days=i), y) for i, y in enumerate(ys)],
        "user_id long, bucket_start timestamp, y double",
    )
    out = holt_winters_additive(df, "y", period=7, alpha=0.3, beta=0.1,
                                gamma=0.2)
    got = {r.rn: (r.level, r.trend, r.seasonal) for r in out.collect()}
    exp = _steps(ys, 0.3, 0.1, 0.2, 7)
    for rn, e in enumerate(exp, start=1):
        assert got[rn] == e, rn  # bit-exact same-order recursion


def test_holt_winters_tracks_planted_trend_and_season(spark):
    """On y = 5 + 0.5*t + (weekly square wave), the filtered trend
    converges near 0.5 and the seasonal slots absorb the wave."""
    from mintpy_spark.operators.holtwinters import holt_winters_additive

    t0 = dt.datetime(2024, 1, 1)
    wave = [3.0 if d % 7 < 3 else -3.0 for d in range(140)]
    rows = [
        (1, t0 + dt.timedelta(days=d), 5.0 + 0.5 * d + wave[d])
        for d in range(140)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, bucket_start timestamp, y double"
    )
    out = holt_winters_additive(df, "y").collect()
    last = max(out, key=lambda r: r.rn)
    assert abs(last.trend - 0.5) < 0.15
    # one-step-ahead residual at the end is small vs the wave amplitude
    assert abs(last.level - (5.0 + 0.5 * 139)) < 1.5
