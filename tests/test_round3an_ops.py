"""Batch an planted truth: sequence-pattern census over hand-built days
— ordering inside a day, cross-day independence, and regex semantics."""

from __future__ import annotations

import datetime as dt


def test_event_pattern_census_fixture(spark):
    from mintpy_spark.queries_behave import event_pattern_census
    import os
    import tempfile

    t0 = dt.datetime(2024, 7, 1)
    rows = [
        # day 1: click -> view -> purchase  => 'cvp' matches c.*p
        (1, t0 + dt.timedelta(hours=1), 100, "click", 1.0, None),
        (1, t0 + dt.timedelta(hours=2), 101, "view", 1.0, None),
        (1, t0 + dt.timedelta(hours=3), 102, "purchase", 1.0, None),
        # day 2: purchase BEFORE click => 'pc' does not match
        (1, t0 + dt.timedelta(days=1, hours=1), 103, "purchase", 1.0, None),
        (1, t0 + dt.timedelta(days=1, hours=2), 104, "click", 1.0, None),
        # day 3 (other user): click only => no match
        (2, t0 + dt.timedelta(hours=1), 105, "click", 1.0, None),
        # same-timestamp ordering: event_id breaks the tie (click id 106
        # before purchase id 107 -> 'cp' matches)
        (3, t0 + dt.timedelta(hours=5), 106, "click", 1.0, None),
        (3, t0 + dt.timedelta(hours=5), 107, "purchase", 1.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "user_id long, ts timestamp, event_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        got = {
            r.user_id: (r.days_active, r.days_matched, r.match_share)
            for r in event_pattern_census(spark, d).collect()
        }
    assert got == {
        1: (2, 1, 0.5),
        2: (1, 0, 0.0),
        3: (1, 1, 1.0),
    }
