"""Round-3 batch y: growth accounting, IVM join view, share of day —
known-answer fixtures and identity properties."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

D = dt.datetime


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return D(2024, 1, 1) + dt.timedelta(days=day, hours=hour)


def test_growth_accounting_known(spark):
    from mintpy_spark.operators.engagement import growth_accounting

    # u1: days 0,1,3  (new@0, retained@1, resurrected@3, churn lands on 2 and 4)
    # u2: day 1 only  (new@1, churn lands on 2)
    rows = [(1, _ts(0)), (1, _ts(1)), (1, _ts(3)), (2, _ts(1))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    ed0 = (D(2024, 1, 1) - D(1970, 1, 1)).days
    out = {r["ed"]: r for r in growth_accounting(df).collect()}
    # active days only: day 2 (churn-only) and day 4 (churn-only) emit no row
    assert set(out) == {ed0, ed0 + 1, ed0 + 3}
    assert (out[ed0]["new_users"], out[ed0]["retained"], out[ed0]["resurrected"],
            out[ed0]["churned"]) == (1, 0, 0, 0)
    assert (out[ed0 + 1]["new_users"], out[ed0 + 1]["retained"],
            out[ed0 + 1]["churned"]) == (1, 1, 0)
    # day 3: u1 resurrects after the 1-day gap
    assert (out[ed0 + 3]["new_users"], out[ed0 + 3]["retained"],
            out[ed0 + 3]["resurrected"]) == (0, 0, 1)


def test_growth_accounting_identities(spark):
    from mintpy_spark.operators.engagement import daily_actives, growth_accounting

    rows = [((i * 7) % 13, _ts(i % 11, i % 24)) for i in range(300)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    ga = {r["ed"]: r for r in growth_accounting(df).collect()}
    dau = {r["ed"]: r["dau"] for r in daily_actives(df, window=1).collect()}
    assert set(ga) == set(dau)
    for ed, r in ga.items():
        # dau(d) = new + retained + resurrected
        assert r["new_users"] + r["retained"] + r["resurrected"] == dau[ed]
        # retained(d) = dau(d-1) - churned(d) whenever d-1 was active
        if ed - 1 in dau:
            assert r["retained"] == dau[ed - 1] - r["churned"]


def test_ivm_partials_merge_equals_full(spark, tmp_path):
    from mintpy_spark.queries_behave import ivm_segment_revenue_delta

    spark.createDataFrame(
        [(1, "n", 1, 0.0, "A"), (2, "n", 1, 0.0, "B")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    orders = [
        (10, 1, "O", 100.10, D(1998, 1, 1), "1"),   # base slice
        (11, 1, "O", 200.20, D(1999, 6, 1), "1"),   # delta slice
        (12, 2, "O", 50.55, D(2000, 1, 1), "1"),    # delta slice
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = {r["c_mktsegment"]: r for r in ivm_segment_revenue_delta(spark, str(tmp_path)).collect()}
    # base + delta partials merged across the 1999 cut == full totals
    assert (out["A"]["revenue_cents"], out["A"]["n_orders"]) == (30030, 2)
    assert (out["B"]["revenue_cents"], out["B"]["n_orders"]) == (5055, 1)


def test_share_of_day_sums_to_10000(spark, tmp_path):
    from mintpy_spark.queries_behave import share_of_day_by_type

    rows = []
    for i in range(120):
        rows.append((i, _ts(i % 4, i % 24), i % 9, f"t{i % 3}", 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = share_of_day_by_type(spark, str(tmp_path))
    per_day = out.groupBy("bucket_start").agg(
        F.sum("cnt").alias("s"), F.max("day_total").alias("t"),
        F.sum("share_bp").alias("bp"),
    ).collect()
    for r in per_day:
        assert r["s"] == r["t"]
        # rounded thirds: 3333+3333+3334 etc — within one bp per type
        assert abs(r["bp"] - 10000) <= 2
