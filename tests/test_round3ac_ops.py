"""Planted-truth tests for batch bbb (TPC-H Q6/Q2/Q11/Q12 shapes)."""

from __future__ import annotations

import datetime as dt

D = dt.datetime


def _li(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_shipdate timestamp",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")


def test_revenue_delta_q6(spark, tmp_path):
    import __spark_entry__ as E

    _li(spark, tmp_path, [
        # in window, d=6, q=10 -> counts: 100.00 * 0.06 -> 10000c * 6
        (1, 1, 1, 10.0, 100.0, 0.06, D(1997, 3, 1)),
        # discount outside band
        (2, 1, 1, 10.0, 100.0, 0.09, D(1997, 3, 1)),
        # quantity too large
        (3, 1, 1, 30.0, 100.0, 0.06, D(1997, 3, 1)),
        # shipped outside the year
        (4, 1, 1, 10.0, 100.0, 0.06, D(1996, 3, 1)),
        # in window, d=5, q=23 boundary -> 5000c * 5
        (5, 1, 1, 23.0, 50.0, 0.05, D(1997, 12, 31)),
    ])
    row = E.queries()["olap_revenue_delta"](spark, str(tmp_path)).collect()[0]
    assert (row.revenue_c10k, row.n_lines) == (10000 * 6 + 5000 * 5, 2)


def _dims(spark, tmp_path):
    spark.createDataFrame(
        [(1, "B1", 5, "PROMO"), (2, "B2", 5, "PROMO"), (3, "B3", 50, "PROMO"),
         (4, "B4", 5, "LARGE")],
        "p_partkey long, p_brand string, p_size int, p_type string",
    ).write.parquet(f"{tmp_path}/part.parquet")
    spark.createDataFrame(
        [(10, "S10", 100), (11, "S11", 100), (12, "S12", 101)],
        "s_suppkey long, s_name string, s_nationkey long",
    ).write.parquet(f"{tmp_path}/supplier.parquet")
    spark.createDataFrame(
        [(100, "ALPHA", 0), (101, "BETA", 1)],
        "n_nationkey long, n_name string, n_regionkey long",
    ).write.parquet(f"{tmp_path}/nation.parquet")


def test_min_cost_supplier_q2(spark, tmp_path):
    import __spark_entry__ as E

    _dims(spark, tmp_path)
    _li(spark, tmp_path, [
        # part 1: supp 10 at 10.00/unit, supp 11 at 8.00/unit -> 11 wins
        (1, 1, 10, 2.0, 20.0, 0.0, D(1997, 1, 1)),
        (2, 1, 11, 2.0, 16.0, 0.0, D(1997, 1, 1)),
        # part 2: exact tie at 5.00/unit -> both kept
        (3, 2, 10, 1.0, 5.0, 0.0, D(1997, 1, 1)),
        (4, 2, 12, 2.0, 10.0, 0.0, D(1997, 1, 1)),
        # part 3 filtered out by p_size, part 4 by p_type
        (5, 3, 10, 1.0, 1.0, 0.0, D(1997, 1, 1)),
        (6, 4, 10, 1.0, 1.0, 0.0, D(1997, 1, 1)),
    ])
    out = E.queries()["olap_min_cost_supplier"](spark, str(tmp_path)).collect()
    got = {(r.p_partkey, r.s_name): (r.unit_cost_micro, r.n_name) for r in out}
    assert got == {
        (1, "S11"): (8_000_000, "ALPHA"),
        (2, "S10"): (5_000_000, "ALPHA"),
        (2, "S12"): (5_000_000, "BETA"),
    }


def test_important_parts_q11(spark, tmp_path):
    import __spark_entry__ as E

    _dims(spark, tmp_path)
    # region 0 = nation 100 = supps 10, 11; supp 12 (region 1) excluded.
    # Values: part 1 -> 9990.00, part 2 -> 5.00, part 3 -> 5.00
    # total region-0 = 10000.00; threshold 0.03% = 3.00 -> all three
    # parts pass; shrink part 2's share below by planting 0.02.
    _li(spark, tmp_path, [
        (1, 1, 10, 1.0, 9990.0, 0.0, D(1997, 1, 1)),
        (2, 2, 11, 1.0, 0.02, 0.0, D(1997, 1, 1)),
        (3, 3, 10, 1.0, 9.98, 0.0, D(1997, 1, 1)),
        (4, 3, 12, 1.0, 1000.0, 0.0, D(1997, 1, 1)),  # wrong region
    ])
    out = E.queries()["olap_important_parts"](spark, str(tmp_path)).collect()
    got = {r.p_partkey: r.value_c for r in out}
    # total_c = 999000 + 2 + 998 = 1000000; keep value_c*10000 > 3e6
    # part 1: 9.99e9 > 3e6 yes; part 2: 2e4 > 3e6 no; part 3: 9.98e6 yes
    assert got == {1: 999000, 3: 998}


def test_ship_priority_class_q12(spark, tmp_path):
    import __spark_entry__ as E

    spark.createDataFrame(
        [(1, "1-URGENT", D(1997, 1, 1)), (2, "5-LOW", D(1997, 1, 1)),
         (3, "2-HIGH", D(1997, 1, 1))],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    ).write.parquet(f"{tmp_path}/orders.parquet")
    _li(spark, tmp_path, [
        (1, 1, 1, 1.0, 1.0, 0.0, D(1997, 3, 15)),  # urgent, 73d late
        (1, 1, 1, 1.0, 1.0, 0.0, D(1997, 1, 20)),  # urgent, ontime
        (2, 1, 1, 1.0, 1.0, 0.0, D(1997, 4, 1)),   # low, late
        (3, 1, 1, 1.0, 1.0, 0.0, D(1997, 3, 2)),   # high, exactly 60d -> ontime
    ])
    out = E.queries()["olap_ship_priority_class"](spark, str(tmp_path)).collect()
    got = {r.ship_class: (r.high_line_count, r.low_line_count) for r in out}
    assert got == {"late": (1, 1), "ontime": (2, 0)}
