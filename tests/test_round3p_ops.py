"""Round-3 batch p: series alignment, column profile, calendar rollup."""

from __future__ import annotations

import tempfile
from datetime import datetime


def _write_events(spark, rows, td):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{td}/events.parquet")


def test_series_align_locf_carry(spark):
    from mintpy_spark.queries_behave import series_align_locf

    rows = [
        # user 0: click v=1.00 @t1, purchase v=5.00 @t2, click v=2.00 @t3
        (0, datetime(2024, 1, 1), 0, "click", 1.00, "{}"),
        (1, datetime(2024, 1, 2), 0, "purchase", 5.00, "{}"),
        (2, datetime(2024, 1, 3), 0, "click", 2.00, "{}"),
        # user 1: purchase only -> fa never defined, no both-rows
        (3, datetime(2024, 1, 1), 1, "purchase", 9.00, "{}"),
    ]
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, rows, td)
        r = series_align_locf(spark, td).collect()[0]
    # union rows: 4; both defined at t2 (1-5) and t3 (2-5)
    assert (r["n_rows"], r["n_users"], r["n_both"]) == (4, 2, 2)
    assert r["diff_cents_sum"] == (100 - 500) + (200 - 500)


def test_profile_events_columns(spark):
    from mintpy_spark.queries_behave import profile_events_columns

    rows = [
        (0, datetime(2024, 1, 1), 10, "click", 1.25, None),
        (1, datetime(2024, 1, 2), 10, "view", None, "{\"k\": 1}"),
        (2, datetime(2024, 1, 3), 11, "click", 3.5, "{\"k\": 2}"),
    ]
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, rows, td)
        out = {r["col_name"]: r for r in profile_events_columns(spark, td).collect()}
    assert set(out) == {"event_id", "ts", "user_id", "event_type", "value", "props"}
    assert (out["value"]["nulls"], out["value"]["n_distinct"]) == (1, 2)
    assert out["value"]["min_num"] == 1.25 and out["value"]["max_num"] == 3.5
    assert out["props"]["nulls"] == 1 and out["props"]["min_str"] == '{"k": 1}'
    assert out["user_id"]["n_distinct"] == 2
    assert out["ts"]["min_num"] == 1704067200.0 * 1e6


def test_olap_monthly_orders_buckets(spark):
    from mintpy_spark.queries_behave import olap_monthly_orders

    rows = [
        (1, 7, "O", 10.01, datetime(1995, 1, 15), "1-URGENT"),
        (2, 7, "O", 20.02, datetime(1995, 1, 31), "1-URGENT"),
        (3, 8, "F", 5.55, datetime(1995, 2, 1), "2-HIGH"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/orders.parquet")
        out = {str(r["month_start"]): r for r in
               olap_monthly_orders(spark, td).collect()}
    jan = out["1995-01-01 00:00:00"]
    assert (jan["orders"], jan["revenue_cents"], jan["customers"]) == (2, 3003, 1)
    feb = out["1995-02-01 00:00:00"]
    assert (feb["orders"], feb["revenue_cents"]) == (1, 555)
