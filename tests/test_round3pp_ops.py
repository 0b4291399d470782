"""Planted-truth tests for batch pp (TPC-H Q5/Q10/Q18 shapes): each
query recovers values seeded into a hand-built micro-warehouse, beyond
the cross-engine oracle equality the driver gate checks."""

from __future__ import annotations

import datetime as dt

import pytest

D = dt.datetime


@pytest.fixture(scope="module")
def wh_dir(spark, tmp_path_factory):
    """Micro-warehouse: nation 0 in ASIA, nation 1 in EUROPE; customer 1
    (nation 0) places order 10 in 1996 with one LOCAL lineitem (supplier
    20, nation 0) and one non-local (supplier 21, nation 1); order 11 is
    out of the 1996 window; order 12 carries a returned item and a
    quantity tail crossing the Q18 threshold."""
    p = tmp_path_factory.mktemp("wh")
    spark.createDataFrame(
        [(0, "ASIA"), (1, "EUROPE")], "r_regionkey int, r_name string"
    ).write.parquet(f"{p}/region.parquet")
    spark.createDataFrame(
        [(0, "JAPAN", 0), (1, "FRANCE", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).write.parquet(f"{p}/nation.parquet")
    spark.createDataFrame(
        [(1, "Customer#1", 0, 100.0, "BUILDING"),
         (2, "Customer#2", 1, 100.0, "AUTOMOBILE")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).write.parquet(f"{p}/customer.parquet")
    spark.createDataFrame(
        [(20, "Supplier#20", 0, 0.0), (21, "Supplier#21", 1, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).write.parquet(f"{p}/supplier.parquet")
    spark.createDataFrame(
        [(10, 1, "O", 1000.00, D(1996, 3, 1), "1-URGENT"),
         (11, 1, "O", 500.00, D(1995, 3, 1), "1-URGENT"),
         (12, 2, "F", 9999.99, D(1996, 2, 1), "2-HIGH")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{p}/orders.parquet")
    li = [
        # order 10: local supplier 20 -> counted in Q5 (100.00 at 10% off)
        (10, 1, 20, 1, 5.0, 100.00, 0.10, 0.0, "N", "O", D(1996, 3, 5)),
        # order 10: supplier 21 is in another nation -> NOT local
        (10, 1, 21, 2, 5.0, 200.00, 0.00, 0.0, "N", "O", D(1996, 3, 6)),
        # order 11: local but outside the 1996 window
        (11, 1, 20, 1, 5.0, 300.00, 0.00, 0.0, "N", "O", D(1995, 3, 5)),
        # order 12: returned item (Q10) + quantities 200+101=301 > 300 (Q18)
        (12, 2, 21, 1, 200.0, 400.00, 0.05, 0.0, "R", "F", D(1996, 2, 5)),
        (12, 2, 21, 2, 101.0, 50.00, 0.00, 0.0, "N", "F", D(1996, 2, 6)),
    ]
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.parquet(f"{p}/lineitem.parquet")
    return str(p)


def test_q5_local_supplier_only_in_window(spark, wh_dir):
    import __spark_entry__ as E

    rows = E.queries()["olap_local_supplier_revenue"](spark, wh_dir).collect()
    # only order 10's supplier-20 line is local AND in 1996 AND in ASIA:
    # 100.00 -> 10000 cents * (100-10) = 900000 cents-percent
    assert len(rows) == 1
    r = rows[0]
    assert r.n_name == "JAPAN" and r.revenue_cp == 900000 and r.n_items == 1


def test_q10_returned_revenue_and_rank(spark, wh_dir):
    import __spark_entry__ as E

    rows = E.queries()["olap_returned_items_top"](spark, wh_dir).collect()
    # only order 12's first line is flagged R: 400.00 -> 40000c * 95
    assert len(rows) == 1
    r = rows[0]
    assert (r.rnk, r.c_custkey, r.n_name) == (1, 2, "FRANCE")
    assert r.revenue_cp == 40000 * 95 and r.n_items == 1


def test_q18_threshold_is_strict(spark, wh_dir):
    import __spark_entry__ as E

    rows = E.queries()["olap_large_volume_orders"](spark, wh_dir).collect()
    # order 12 sums to 301 > 300; orders 10 (10) and 11 (5) do not
    assert len(rows) == 1
    r = rows[0]
    assert (r.o_orderkey, r.c_custkey, r.sum_qty) == (12, 2, 301)
    assert r.total_cents == 999999
