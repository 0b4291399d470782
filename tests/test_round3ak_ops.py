"""Batch ak planted truth: trend-break search recovers a planted slope
discontinuity exactly, reports zero residual SSE and full gain, and
stays quiet (gain ~ 0) on a pure single line."""

from __future__ import annotations

import datetime as dt


def _rows(key: str, vals: list[float], per_day: int = 2):
    t0 = dt.datetime(2024, 1, 1, 6)
    out = []
    for d, v in enumerate(vals):
        for j in range(per_day):
            out.append((key, t0 + dt.timedelta(days=d, hours=j), v))
    return out


def test_trend_break_recovers_planted_discontinuity(spark):
    from mintpy_spark.operators.changepoint import trend_break

    # days 0..9 on line 10 + 2t; days 10..24 on line 100 - 3t (level AND
    # slope jump, so only the true split has zero total SSE)
    vals = [round(10.0 + 2.0 * d, 2) for d in range(10)]
    vals += [round(100.0 - 3.0 * d, 2) for d in range(10, 25)]
    df = spark.createDataFrame(
        _rows("k", vals), "url string, warc_ts timestamp, value double"
    )
    r = trend_break(df, "value").collect()[0]
    assert r.break_day == dt.datetime(2024, 1, 10)  # last day of segment 1
    assert (r.n_days_left, r.n_days_right) == (10, 15)
    assert r.sse_break == 0.0
    assert r.gain == 1.0
    assert r.sse_single > 0


def test_trend_break_single_line_has_no_gain(spark):
    from mintpy_spark.operators.changepoint import trend_break

    vals = [round(5.0 + 0.25 * d, 2) for d in range(20)]
    df = spark.createDataFrame(
        _rows("k", vals), "url string, warc_ts timestamp, value double"
    )
    r = trend_break(df, "value").collect()[0]
    # 0.25*d stays exactly 2dp so the single line fits perfectly: every
    # candidate split also has zero SSE and gain is NULL (0/0 guarded)
    assert r.sse_single == 0.0 and r.sse_break == 0.0
    assert r.gain is None


def test_trend_break_needs_two_days_each_side(spark):
    from mintpy_spark.operators.changepoint import trend_break

    df = spark.createDataFrame(
        _rows("k", [1.0, 2.0, 3.0]),  # 3 days -> no valid candidate
        "url string, warc_ts timestamp, value double",
    )
    assert trend_break(df, "value").count() == 0
