"""Round-4 batch e planted truth: the Kalman local-level recursion
hand-stepped for a short series, plus invariants."""

from __future__ import annotations

import datetime as dt


def _steps(ys, q, r):
    m, p = ys[0], r
    out = [m]
    for y in ys[1:]:
        pp = p + q
        k = pp / (pp + r)
        m = m + k * (y - m)
        p = (1.0 - k) * pp
        out.append(m)
    return out


def test_kalman_level_planted(spark):
    from mintpy_spark.operators.kalman import kalman_level

    t0 = dt.datetime(2024, 7, 1)
    ys = [10.0, 12.0, 11.0, 15.0, 9.0]
    rows = [(1, t0 + dt.timedelta(hours=i), y) for i, y in enumerate(ys)]
    # key 2: constant series must stay exactly at the constant
    rows += [(2, t0 + dt.timedelta(hours=i), 7.5) for i in range(4)]
    # key 3: NULL observations drop out of the ranking entirely
    rows += [
        (3, t0, 1.0),
        (3, t0 + dt.timedelta(hours=1), None),
        (3, t0 + dt.timedelta(hours=2), 3.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = kalman_level(df, "value", q=0.04, r=1.0)
    got = {(r.user_id, r.rn): r.level for r in out.collect()}

    exp = _steps(ys, 0.04, 1.0)
    for i, e in enumerate(exp, start=1):
        assert got[(1, i)] == e, i  # bit-exact same-order recursion
    assert all(got[(2, i)] == 7.5 for i in range(1, 5))
    assert (3, 3) not in got and got[(3, 2)] == _steps([1.0, 3.0], 0.04, 1.0)[1]


def test_kalman_gain_is_data_independent_and_converges(spark):
    """The variance/gain recursion is data-independent: two keys with
    different data smooth with identical weights, and the steady-state
    gain approaches the Riccati fixed point."""
    q, r = 0.04, 1.0
    p, ks = r, []
    for _ in range(200):
        pp = p + q
        k = pp / (pp + r)
        p = (1.0 - k) * pp
        ks.append(k)
    # Riccati fixed point: u* = p* + q solves u^2 - q*u - q*r = 0, and
    # the steady-state gain is k* = u* / (u* + r)
    import math

    ustar = (q + math.sqrt(q * q + 4 * q * r)) / 2
    kstar = ustar / (ustar + r)
    assert abs(ks[-1] - kstar) < 1e-9
