"""Round-4 batch n planted truth: the Welford recursion hand-stepped,
and its agreement with batch two-pass variance."""

from __future__ import annotations

import datetime as dt
import os
import tempfile


def _welford(ys):
    n, mean, m2 = 1, ys[0], 0.0
    for y in ys[1:]:
        n2 = n + 1
        delta = y - mean
        mean_new = mean + delta / float(n2)
        m2 = m2 + delta * (y - mean_new)
        mean = mean_new
        n = n2
    return n, mean, m2


def test_welford_online_var_planted(spark):
    import math
    import statistics

    from mintpy_spark.queries_tiers import welford_online_var

    t0 = dt.datetime(2024, 6, 1)
    ys1 = [2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0]
    rows = [
        (1, t0 + dt.timedelta(hours=i), i, "v", y, None)
        for i, y in enumerate(ys1)
    ]
    rows.append((2, t0, 99, "v", 3.5, None))  # single point -> NULL var
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long,"
        " event_type string, value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        got = {r.user_id: r.asDict()
               for r in welford_online_var(spark, d).collect()}

    n, mean, m2 = _welford(ys1)
    assert got[1]["n"] == n == 8
    assert got[1]["mean_e6"] == math.floor(mean * 1e6) == 5_000_000
    assert got[1]["m2_e6"] == math.floor(m2 * 1e6)
    assert got[1]["var_e6"] == math.floor(m2 / (n - 1) * 1e6)
    # Welford agrees with the two-pass batch variance
    assert abs(m2 / (n - 1) - statistics.variance(ys1)) < 1e-12
    assert got[2]["n"] == 1 and got[2]["var_e6"] is None
    assert got[2]["m2_e6"] == 0
