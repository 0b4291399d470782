"""Planted-truth tests for batch ss (ACF spectrum, Ljung-Box, Hurst):
alternating and linear-trend series with hand-derived statistics."""

from __future__ import annotations

import datetime as dt
import math

import pytest

D = dt.datetime


@pytest.fixture(scope="module")
def series_dir(spark, tmp_path_factory):
    """Type 'p': 6 days alternating 1.0/2.0 (pure period-2 signal).
    Type 'q': 16 days linear trend 1..16 (persistent, H near 1)."""
    rows = []
    eid = 0
    for day in range(6):
        eid += 1
        rows.append((eid, D(2024, 1, 1 + day, 12), 1, "p",
                     1.0 if day % 2 == 0 else 2.0, "{}"))
    for day in range(16):
        eid += 1
        rows.append((eid, D(2024, 1, 1 + day, 12), 2, "q",
                     float(day + 1), "{}"))
    p = tmp_path_factory.mktemp("ss") / "ev"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{p}/events.parquet")
    return str(p)


def test_acf_alternating_series(spark, series_dir):
    import __spark_entry__ as E

    rows = E.queries()["acf_lag_spectrum"](spark, series_dir).collect()
    p = {r.lag: r for r in rows if r.event_type == "p"}
    # y = 6x - 900 over cents [100,200,...] -> y alternates -300/+300
    # lag 1: 5 products of -90000 over den 6*90000
    assert p[1].num == -450000 and p[1].den == 540000
    assert p[1].r == pytest.approx(round(-450000 / 540000, 4))
    # lag 2: 4 products of +90000
    assert p[2].num == 360000
    assert p[2].r == pytest.approx(round(360000 / 540000, 4))
    # signs keep alternating with lag parity
    assert p[3].num < 0 and p[4].num > 0


def _acf_ints(xs: list[int], lag: int) -> tuple[int, int]:
    n, s = len(xs), sum(xs)
    y = [n * x - s for x in xs]
    num = sum(y[t] * y[t + lag] for t in range(n - lag))
    den = sum(v * v for v in y)
    return num, den


def test_ljung_box_trend_matches_reimplementation(spark, series_dir):
    import __spark_entry__ as E

    rows = E.queries()["ljung_box_daily"](spark, series_dir).collect()
    out = {r.event_type: r for r in rows}
    # type p has only 6 days (< 8) -> filtered out
    assert "p" not in out
    q = out["q"]
    xs = [100 * (i + 1) for i in range(16)]
    acc = 0.0
    for k in range(1, 8):
        num, den = _acf_ints(xs, k)
        r = num / den
        acc += r * r / (16 - k)
    expect = round(16 * 18.0 * acc, 4)
    assert q.n_days == 16 and q.n_lags == 7
    assert q.q_stat == pytest.approx(expect, abs=1e-9)


def test_hurst_linear_trend_is_persistent(spark, series_dir):
    import __spark_entry__ as E

    rows = E.queries()["hurst_rs_daily"](spark, series_dir).collect()
    out = {r.event_type: r for r in rows}
    # 'p' has no full 16-block -> absent; 'q' has 2x8 + 1x16 blocks
    assert "p" not in out
    h = out["q"]
    assert (h.blocks_8, h.blocks_16) == (2, 1)

    def rs(xs: list[int]) -> float:
        w, s = len(xs), sum(xs)
        y = [w * x - s for x in xs]
        z, cum = [], 0
        for v in y:
            cum += v
            z.append(cum)
        r_y = max(z) - min(z)
        ss = sum(v * v for v in y)
        return r_y * math.sqrt(w / ss)

    xs = [100 * (i + 1) for i in range(16)]
    rs8 = round((rs(xs[:8]) + rs(xs[8:])) / 2, 4)
    rs16 = round(rs(xs), 4)
    assert h.rs_8 == pytest.approx(rs8, abs=1e-9)
    assert h.rs_16 == pytest.approx(rs16, abs=1e-9)
    expect_h = round(math.log(rs16 / rs8) / math.log(2.0), 4)
    assert h.hurst == pytest.approx(expect_h, abs=1e-9)
    assert h.hurst > 0.9  # linear trend = strongly persistent
