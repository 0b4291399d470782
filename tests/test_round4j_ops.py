"""Round-4 batch j planted truth: KM risk-table rows and Mann-Whitney
doubled rank sums hand-computed on tiny populations."""

from __future__ import annotations

import datetime as dt
import os
import tempfile


def _write_events(spark, d, rows):
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long,"
        " event_type string, value double, props string",
    )
    df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))


def test_survival_km_risk_table_planted(spark):
    from mintpy_spark.queries_stats2 import survival_km_risk_table

    t0 = dt.datetime(2024, 1, 1)

    def ev(uid, day_first, day_last):
        return [
            (uid, t0 + dt.timedelta(days=day_first), 1, "view", 1.0, None),
            (uid, t0 + dt.timedelta(days=day_last), 2, "view", 1.0, None),
        ]

    # horizon = day 30 (user 4's last event).
    rows = (
        ev(1, 0, 5)      # lifetime 5, last day 5  -> died (gap 25)
        + ev(2, 0, 5)    # lifetime 5, died
        + ev(3, 10, 25)  # lifetime 15, last day 25 -> censored (gap 5)
        + ev(4, 10, 30)  # lifetime 20, last day 30 -> censored (gap 0)
        + ev(5, 0, 20)   # lifetime 20, last day 20 -> died (gap 10)
    )
    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, d, rows)
        got = {r.lifetime_d: r.asDict()
               for r in survival_km_risk_table(spark, d).collect()}

    assert got[5] == {"lifetime_d": 5, "d_events": 2, "c_censored": 0,
                      "n_at_risk": 5}
    assert got[15] == {"lifetime_d": 15, "d_events": 0, "c_censored": 1,
                       "n_at_risk": 3}
    assert got[20] == {"lifetime_d": 20, "d_events": 1, "c_censored": 1,
                       "n_at_risk": 2}


def test_mannwhitney_planted(spark):
    from mintpy_spark.queries_stats2 import mannwhitney_wkday_wkend

    # 2024-01-06/07 = Sat/Sun; 2024-01-08 = Mon
    sat = dt.datetime(2024, 1, 6, 12)
    mon = dt.datetime(2024, 1, 8, 12)
    # weekday values {1, 2, 2}, weekend values {2, 3}
    rows = [
        (1, mon, 1, "v", 1.0, None),
        (1, mon, 2, "v", 2.0, None),
        (2, mon, 3, "v", 2.0, None),
        (3, sat, 4, "v", 2.0, None),
        (3, sat, 5, "v", 3.0, None),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, d, rows)
        r = mannwhitney_wkday_wkend(spark, d).collect()[0].asDict()

    # ranks: 1 -> 1; the three 2s share avg rank 3; 3 -> 5
    # R1 (weekday) = 1 + 3 + 3 = 7 -> U1 = 7 - 3*4/2 = 1 -> u1_x2 = 2
    # R2 (weekend) = 3 + 5 = 8 -> U2 = 8 - 2*3/2 = 5 -> u2_x2 = 10
    assert r == {
        "n1": 3, "n2": 2, "u1_x2": 2, "u2_x2": 10,
        "tie_term": 3 ** 3 - 3,
    }
    assert r["u1_x2"] + r["u2_x2"] == 2 * r["n1"] * r["n2"]
