"""Batch aj planted truth: politeness schedule closed form vs the
literal sequential recurrence, and the Cho/Garcia-Molina change-rate
estimator vs hand math (including NULL-snapshot interval handling)."""

from __future__ import annotations

import datetime as dt
import math
import random


def _recurrence(ready_us: list[int], d_us: int) -> list[int]:
    out = []
    for r in ready_us:
        s = r if not out else max(r, out[-1] + d_us)
        out.append(s)
    return out


def test_politeness_matches_sequential_recurrence(spark):
    from mintpy_spark.operators.crawlsched import politeness_schedule

    rng = random.Random(11)
    t0 = dt.datetime(2024, 1, 1)
    rows, want = [], {}
    for host in ("a", "b", "c"):
        # bursty arrivals: clumps tighter than the delay, then gaps
        ready, cur = [], 0
        for _ in range(40):
            cur += rng.choice([100_000, 500_000, 3_000_000, 30_000_000])
            ready.append(cur)
        sched = _recurrence(ready, 2_000_000)
        for i, (r, s) in enumerate(zip(ready, sched)):
            rows.append((host, t0 + dt.timedelta(microseconds=r), i))
            want[(host, i + 1)] = s - r  # wait_us by (host, fetch_seq)
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, event_id long")
    got = politeness_schedule(
        df, host="url", ts="warc_ts", min_delay_s=2, order_cols=("event_id",)
    ).collect()
    assert len(got) == len(rows)
    for r in got:
        assert want[(r.url, r.fetch_seq)] == r.wait_us, (r.url, r.fetch_seq)
        assert r.wait_us >= 0


def test_politeness_fifo_and_idle_reset(spark):
    """A burst of 3 then a long gap: the 2nd and 3rd queue behind the
    delay, the 4th (past the backlog) starts exactly at its ready time."""
    from mintpy_spark.operators.crawlsched import politeness_schedule

    t0 = dt.datetime(2024, 6, 1)
    s = lambda x: t0 + dt.timedelta(seconds=x)
    df = spark.createDataFrame(
        [("h", s(0.0), 1), ("h", s(0.5), 2), ("h", s(0.7), 3), ("h", s(60.0), 4)],
        "url string, warc_ts timestamp, event_id long",
    )
    got = {
        r.fetch_seq: (r.sched_ts, r.wait_us)
        for r in politeness_schedule(
            df, host="url", ts="warc_ts", min_delay_s=2, order_cols=("event_id",)
        ).collect()
    }
    assert got[1] == (s(0.0), 0)
    assert got[2] == (s(2.0), 1_500_000)
    assert got[3] == (s(4.0), 3_300_000)
    assert got[4] == (s(60.0), 0)


def test_change_rate_hand_math_and_null_snapshots(spark):
    from mintpy_spark.operators.crawlsched import change_rate_estimate

    t0 = dt.datetime(2024, 2, 1)
    h = lambda i: t0 + dt.timedelta(hours=6 * i)
    rows = [
        # k1: 5 snapshots, changes at intervals 1 and 3 -> X=2, m=4,
        # span 24h = 1 day, I = 0.25d
        ("k1", h(0), 1.0), ("k1", h(1), 2.0), ("k1", h(2), 2.0),
        ("k1", h(3), 3.0), ("k1", h(4), 3.0),
        # k2: NULL snapshot is still an interval: 1 -> NULL (change),
        # NULL -> NULL (no change), NULL -> 2 (change) -> X=2, m=3
        ("k2", h(0), 1.0), ("k2", h(1), None), ("k2", h(2), None),
        ("k2", h(3), 2.0),
        # k3: every interval changes -> estimator degenerate -> NULL
        ("k3", h(0), 1.0), ("k3", h(1), 2.0), ("k3", h(2), 3.0),
        # k4: single snapshot -> dropped
        ("k4", h(0), 9.0),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, value double")
    got = {
        r.url: r
        for r in change_rate_estimate(df, "value", key="url", ts="warc_ts").collect()
    }
    assert set(got) == {"k1", "k2", "k3"}
    k1 = got["k1"]
    assert (k1.num_intervals, k1.num_changes) == (4, 2)
    assert abs(k1.span_days - 1.0) < 1e-12
    want = -math.log(1 - 2 / 4.0) / (1.0 / 4)
    assert abs(k1.lambda_per_day - want) < 1e-9
    k2 = got["k2"]
    assert (k2.num_intervals, k2.num_changes) == (3, 2)
    assert got["k3"].lambda_per_day is None
