"""Round-3 batch n: Holt forecast, funnel, rolling median."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_holt_recovers_perfect_linear_trend(spark):
    """On y(t) = 10 + 3t the Holt state converges to (level, trend=3)
    exactly in dyadic arithmetic, so the 7-day holdout error is 0 and
    MASE is 0."""
    from mintpy_spark.operators.forecast import holt_linear_mase_daily

    rows = []
    for d in range(30):
        cnt = 10 + 3 * d
        for i in range(cnt):
            rows.append((len(rows), datetime(2024, 1, d + 1, 12), 0,
                         "click", 0.0, "{}"))
    res = holt_linear_mase_daily(_events(spark, rows)).collect()
    assert len(res) == 1
    r = res[0]
    assert r["n_train"] == 23 and r["n_test"] == 7
    # trend recovered exactly: b = 3.0 -> 3_000_000 micro
    assert r["b_end_micro"] == 3_000_000
    assert r["sum_abs_err_micro"] == 0
    assert r["mase_micro"] == 0
    assert r["denom"] == 3 * 22


def test_holt_drops_short_series(spark):
    from mintpy_spark.operators.forecast import holt_linear_mase_daily

    rows = [(i, datetime(2024, 1, i + 1, 12), 0, "click", 0.0, "{}")
            for i in range(8)]  # 8 days < horizon + 2
    assert holt_linear_mase_daily(_events(spark, rows)).count() == 0


def test_funnel_strict_ordering(spark):
    from mintpy_spark.queries_behave import funnel_3step

    rows = [
        # user 0: click -> view -> purchase (completes; 2h conversion)
        (0, datetime(2024, 1, 1, 0), 0, "click", 0.0, "{}"),
        (1, datetime(2024, 1, 1, 1), 0, "view", 0.0, "{}"),
        (2, datetime(2024, 1, 1, 2), 0, "purchase", 0.0, "{}"),
        # user 1: view BEFORE click -> stops at step 1
        (3, datetime(2024, 1, 2, 1), 1, "view", 0.0, "{}"),
        (4, datetime(2024, 1, 2, 2), 1, "click", 0.0, "{}"),
        # user 2: click -> view, purchase precedes the view -> step 2 only
        (5, datetime(2024, 1, 3, 0), 2, "click", 0.0, "{}"),
        (6, datetime(2024, 1, 3, 2), 2, "view", 0.0, "{}"),
        (7, datetime(2024, 1, 3, 1), 2, "purchase", 0.0, "{}"),
        # user 3: never clicks
        (8, datetime(2024, 1, 4, 0), 3, "view", 0.0, "{}"),
    ]
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        _events(spark, rows).write.parquet(f"{td}/events.parquet")
        r = funnel_3step(spark, td).collect()[0]
    assert (r["users"], r["step1_click"], r["step2_view"],
            r["step3_purchase"]) == (4, 3, 2, 1)
    assert r["conv_us_total"] == 2 * 3600 * 1_000_000


def test_runmedian_matches_sorted_middle(spark):
    from mintpy_spark.queries_behave import temporal_filter_runmedian

    rows = [(i, datetime(2024, 1, 1 + i, 0), 7, "view", float(v), "{}")
            for i, v in enumerate([5.0, 1.0, 9.0, 3.0, 7.0])]
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        _events(spark, rows).write.parquet(f"{td}/events.parquet")
        out = (temporal_filter_runmedian(spark, td)
               .orderBy("ts").select("wmed", "wcnt").collect())
    # ±3d windows over days 1..5: day1 sees days 1-4 [5,1,9,3] med 4;
    # days 2-4 see all five [5,1,9,3,7] med 5; day5 sees days 2-5
    # [1,9,3,7] med (3+7)/2 = 5
    assert [(r["wmed"], r["wcnt"]) for r in out] == [
        (4.0, 4), (5.0, 5), (5.0, 5), (5.0, 5), (5.0, 4)]
