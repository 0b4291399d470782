"""Round-3 batch x: OLAP Q4/Q13/Q22 analog shapes + week-over-week tier
delta — known-answer fixtures over temp parquet."""

from __future__ import annotations

import datetime as dt

D = dt.datetime


def _d(y, m, d):
    return D(y, m, d)


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")


def test_order_priority_semijoin_known(spark, tmp_path):
    from mintpy_spark.queries_tpch import olap_order_priority_semijoin

    _write_orders(
        spark,
        tmp_path,
        [
            (1, 1, "O", 10.0, _d(1996, 3, 1), "1-URGENT"),   # late line -> counted
            (2, 1, "O", 10.0, _d(1996, 3, 1), "1-URGENT"),   # on-time only -> not
            (3, 1, "O", 10.0, _d(1995, 1, 1), "2-HIGH"),     # outside window
        ],
    )
    li = [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _d(1996, 6, 1)),   # +92d late
        (1, 1, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", _d(1996, 3, 5)),   # also late? +4d no
        (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _d(1996, 3, 10)),  # +9d, on time
        (3, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _d(1995, 8, 1)),   # late but order outside window
    ]
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    out = {r["o_orderpriority"]: r["n_orders"]
           for r in olap_order_priority_semijoin(spark, str(tmp_path)).collect()}
    # order 1 counted ONCE despite one late + one on-time line (semi join)
    assert out == {"1-URGENT": 1}


def test_custdist_includes_zero_bucket(spark, tmp_path):
    from mintpy_spark.queries_tpch import olap_custdist

    spark.createDataFrame(
        [(1, "n1", 1, 0.0, "A"), (2, "n2", 1, 0.0, "A"), (3, "n3", 1, 0.0, "B")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    _write_orders(
        spark,
        tmp_path,
        [(10, 1, "O", 1.0, _d(1996, 1, 1), "1"), (11, 1, "O", 1.0, _d(1996, 1, 2), "1")],
    )
    out = {r["c_count"]: r["custdist"]
           for r in olap_custdist(spark, str(tmp_path)).collect()}
    # cust 1 -> 2 orders; custs 2,3 -> the ZERO bucket (left join kept them)
    assert out == {2: 1, 0: 2}


def test_idle_rich_threshold_and_anti_join(spark, tmp_path):
    from mintpy_spark.queries_tpch import olap_idle_rich_customers

    # balances in cents: 100.00, 200.00, 600.00 -> mean 300.00 cents=30000
    spark.createDataFrame(
        [
            (1, "n", 1, 100.0, "A"),
            (2, "n", 1, 200.0, "A"),
            (3, "n", 1, 600.0, "B"),   # above mean, lapsed -> the one row
            (4, "n", 1, -50.0, "B"),   # negative: excluded from the mean
        ],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    _write_orders(
        spark,
        tmp_path,
        [
            (10, 3, "O", 1.0, _d(1997, 1, 1), "1"),  # OLD order: still lapsed
            (11, 2, "O", 1.0, _d(1999, 6, 1), "1"),  # recent: not lapsed (and below mean anyway)
        ],
    )
    out = olap_idle_rich_customers(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["c_mktsegment"], r["n_custs"], r["total_cents"]) == ("B", 1, 60000)


def test_wow_change_known(spark, tmp_path):
    from mintpy_spark.queries_tpch import rollup_1d_wow_change

    rows = []
    eid = 0
    for day, n in [(_d(2024, 1, 1), 4), (_d(2024, 1, 8), 5), (_d(2024, 1, 9), 2)]:
        for i in range(n):
            rows.append((eid, day + dt.timedelta(hours=i), 1, "click", 1.5, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["bucket_start"]: r for r in rollup_1d_wow_change(spark, str(tmp_path)).collect()}
    # only Jan 8 has a day exactly 7d earlier; 4 -> 5 = +25.00%
    assert list(out) == [_d(2024, 1, 8)]
    r = out[_d(2024, 1, 8)]
    assert (r["cnt"], r["cnt_prev_week"], r["wow_cnt_bp"]) == (5, 4, 2500)
    assert abs(r["vsum"] - 7.5) < 1e-9
