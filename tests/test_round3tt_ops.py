"""Planted-truth tests for batch tt (TPC-H Q14/Q16/Q20 shapes)."""

from __future__ import annotations

import datetime as dt

import pytest

D = dt.datetime


@pytest.fixture(scope="module")
def wh_dir(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("tt")
    spark.createDataFrame(
        [(1, "p1", "Brand#1", "PROMO", 5, 10.0),
         (2, "p2", "Brand#2", "STANDARD", 15, 10.0),
         (3, "p3", "Brand#5", "ECONOMY", 30, 10.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).write.parquet(f"{p}/part.parquet")
    spark.createDataFrame(
        [(20, "Supplier#20", 0, 0.0), (21, "Supplier#21", 1, 0.0),
         (22, "Supplier#22", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).write.parquet(f"{p}/supplier.parquet")
    li = [
        # March 1996 (Q14 window): one promo line, one standard line
        (100, 1, 20, 1, 10.0, 100.00, 0.00, 0.0, "N", "O", D(1996, 3, 10)),
        (100, 2, 21, 2, 2.0, 300.00, 0.10, 0.0, "N", "O", D(1996, 3, 15)),
        # May 1996: small part again via supplier 20 (Q16/Q20 material)
        (101, 1, 20, 1, 40.0, 50.00, 0.00, 0.0, "N", "O", D(1996, 5, 1)),
        # large part (size 30) for supplier 20
        (101, 3, 20, 2, 7.0, 50.00, 0.00, 0.0, "N", "O", D(1996, 6, 1)),
    ]
    # supplier 22: 25 small-part shipments of qty 4 -> trips the Q20 gate
    li += [
        (200 + i, 1, 22, 1, 4.0, 10.00, 0.00, 0.0, "N", "O", D(1996, 7, 1))
        for i in range(25)
    ]
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.parquet(f"{p}/lineitem.parquet")
    return str(p)


def test_q14_promo_share(spark, wh_dir):
    import __spark_entry__ as E

    r = E.queries()["olap_promo_revenue_share"](spark, wh_dir).collect()[0]
    # March only: promo 100.00 (10000c*100) vs standard 300.00 at 10% off
    assert r.promo_cp == 1_000_000
    assert r.total_cp == 1_000_000 + 30000 * 90
    assert r.n_items == 2
    assert r.promo_bp == 2703  # round(10000 * 10/37)


def test_q16_census_excludes_brand_and_bands_sizes(spark, wh_dir):
    import __spark_entry__ as E

    rows = E.queries()["olap_part_supplier_census"](spark, wh_dir).collect()
    out = {(r.p_brand, r.size_band): r for r in rows}
    # Brand#5 excluded entirely
    assert all(b != "Brand#5" for b, _ in out)
    b1 = out[("Brand#1", 0)]  # size 5 -> band 0
    assert b1.n_parts == 1 and b1.n_suppliers == 2  # supps 20 and 22
    assert b1.n_items == 27
    b2 = out[("Brand#2", 1)]  # size 15 -> band 1
    assert (b2.n_suppliers, b2.n_parts, b2.n_items) == (1, 1, 1)


def test_q20_excess_gate_integer_compare(spark, wh_dir):
    import __spark_entry__ as E

    rows = E.queries()["olap_excess_supply_suppliers"](spark, wh_dir).collect()
    out = {r.s_suppkey: r for r in rows}
    # supplier 22: small=100 over 25 shipments of total 100:
    # 5*100*25 = 12500 > 100*100 -> qualifies
    assert 22 in out
    assert (out[22].small_qty, out[22].total_qty, out[22].n_ship) == (100, 100, 25)
    # supplier 20: small=50, total=57, n=3 -> 750 < 5700 -> out
    assert 20 not in out
    # supplier 21 shipped no small parts -> no small row at all
    assert 21 not in out
