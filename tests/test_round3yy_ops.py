"""Planted-truth tests for batch yy (TPC-H Q7/Q8/Q9 shapes)."""

from __future__ import annotations

import datetime as dt

import pytest

D = dt.datetime


@pytest.fixture(scope="module")
def wh_dir(spark, tmp_path_factory):
    """NATION_1 and NATION_2 in ASIA, NATION_3 in EUROPE. Customer 1 in
    NATION_1; suppliers 20/21/22 in NATION_1/2/3. One order with three
    lines — one local (excluded by Q7's inequality), one cross-nation,
    one from outside the tracked pair."""
    p = tmp_path_factory.mktemp("yy")
    spark.createDataFrame(
        [(0, "ASIA"), (1, "EUROPE")], "r_regionkey int, r_name string"
    ).write.parquet(f"{p}/region.parquet")
    spark.createDataFrame(
        [(0, "NATION_1", 0), (1, "NATION_2", 0), (2, "NATION_3", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).write.parquet(f"{p}/nation.parquet")
    spark.createDataFrame(
        [(1, "Customer#1", 0, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).write.parquet(f"{p}/customer.parquet")
    spark.createDataFrame(
        [(20, "S20", 0, 0.0), (21, "S21", 1, 0.0), (22, "S22", 2, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).write.parquet(f"{p}/supplier.parquet")
    spark.createDataFrame(
        [(10, 1, "O", 100.0, D(1996, 3, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{p}/orders.parquet")
    spark.createDataFrame(
        [
            # supplier 20 = customer's own nation: Q7 excludes, Q8 target
            (10, 1, 20, 1, 1.0, 100.00, 0.00, 0.0, "N", "O", D(1996, 3, 5)),
            # supplier 21 = NATION_2: the Q7 pair row
            (10, 2, 21, 2, 1.0, 200.00, 0.10, 0.0, "N", "O", D(1996, 3, 6)),
            # supplier 22 = NATION_3: outside Q7's tracked pair
            (10, 1, 22, 3, 1.0, 400.00, 0.00, 0.0, "N", "O", D(1996, 3, 7)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.parquet(f"{p}/lineitem.parquet")
    spark.createDataFrame(
        [(1, "red widget", "Brand#1", "PROMO", 5, 1.0),
         (2, "blue bolt", "Brand#2", "STANDARD", 15, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).write.parquet(f"{p}/part.parquet")
    return str(p)


def test_q7_tracks_only_cross_nation_pair(spark, wh_dir):
    import __spark_entry__ as E

    rows = E.queries()["olap_volume_shipping"](spark, wh_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.supp_nation, r.cust_nation, r.ship_year) == (
        "NATION_2", "NATION_1", 1996
    )
    assert r.revenue_cp == 20000 * 90 and r.n_items == 1


def test_q8_share_folds_into_one_agg(spark, wh_dir):
    import __spark_entry__ as E

    rows = E.queries()["olap_market_share"](spark, wh_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    # ASIA customer bought from all three suppliers; NATION_1 supplied
    # 100.00 of 100+180+400 = 680.00 effective
    target = 10000 * 100
    total = 10000 * 100 + 20000 * 90 + 40000 * 100
    assert (r.target_cp, r.total_cp) == (target, total)
    assert r.share_bp == (20000 * target + total) // (2 * total)


def test_q9_like_prunes_parts(spark, wh_dir):
    import __spark_entry__ as E

    rows = E.queries()["olap_product_type_profit"](spark, wh_dir).collect()
    # only part 1 ('red widget') matches; lines 1 (supp 20) and 3 (supp 22)
    out = {r.supp_nation: r for r in rows}
    assert set(out) == {"NATION_1", "NATION_3"}
    assert out["NATION_1"].revenue_cp == 10000 * 100
    assert out["NATION_3"].revenue_cp == 40000 * 100
    assert all(r.ship_year == 1996 for r in rows)
