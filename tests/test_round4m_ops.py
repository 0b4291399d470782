"""Round-4 batch m planted truth: nearest as-of tie/edge rules and
ROLLUP grouping levels."""

from __future__ import annotations

import datetime as dt


def test_asof_nearest_sides_and_ties(spark):
    from mintpy_spark.operators.asof import asof_nearest

    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)

    def s(sec):
        return t0 + dt.timedelta(seconds=sec)

    obs = spark.createDataFrame(
        [("k", s(0), 1, 10.0), ("k", s(100), 2, 20.0),
         ("k", s(300), 3, 30.0)],
        "k string, ts timestamp, event_id long, v double",
    )
    probes = spark.createDataFrame(
        [("k", s(40), 10),    # 40 back vs 60 fwd -> prev (10.0)
         ("k", s(50), 11),    # 50 vs 50 tie -> prev wins
         ("k", s(260), 12),   # 160 back vs 40 fwd -> next (30.0)
         ("k", s(400), 13),   # past the last obs -> prev only
         ("q", s(0), 14)],    # keyless island -> none
        "k string, ts timestamp, event_id long",
    )
    got = {r.event_id: r.asDict()
           for r in asof_nearest(probes, obs, "k", "ts", "v",
                                 order_cols=("event_id",)).collect()}
    assert (got[10]["v_nearest"], got[10]["side"]) == (10.0, "prev")
    assert (got[11]["v_nearest"], got[11]["side"]) == (10.0, "prev")
    assert got[11]["dist_us"] == 50_000_000
    assert (got[12]["v_nearest"], got[12]["side"]) == (30.0, "next")
    assert (got[13]["v_nearest"], got[13]["side"]) == (30.0, "prev")
    assert got[14]["v_nearest"] is None and got[14]["side"] == "none"


def test_olap_rollup_hierarchy_levels(spark):
    import os
    import tempfile

    from mintpy_spark.queries_behave import olap_rollup_hierarchy

    r = spark.createDataFrame(
        [(1, "EUROPE"), (2, "AFRICA")], "r_regionkey long, r_name string"
    )
    n = spark.createDataFrame(
        [(10, "FRANCE", 1), (20, "KENYA", 2)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    c = spark.createDataFrame(
        [(1, "S", 10), (2, "S", 20)],
        "c_custkey long, c_mktsegment string, c_nationkey long",
    )
    o = spark.createDataFrame(
        [(100, 1, "1997-01-01"), (200, 2, "1997-01-01")],
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).selectExpr("o_orderkey", "o_custkey",
                 "CAST(o_orderdate AS TIMESTAMP) o_orderdate")
    li = spark.createDataFrame(
        [(100, 10.00, 0.00), (200, 20.00, 0.50)],
        "l_orderkey long, l_extendedprice double, l_discount double",
    )
    with tempfile.TemporaryDirectory() as d:
        for name, df in (("region", r), ("nation", n), ("customer", c),
                         ("orders", o), ("lineitem", li)):
            df.coalesce(1).write.parquet(os.path.join(d, f"{name}.parquet"))
        rows = olap_rollup_hierarchy(spark, d).collect()
    got = {(x.r_name, x.n_name, x.gid): x.asDict() for x in rows}
    # cells: FRANCE 1000c * 100 = 100000; KENYA 2000c * 50 = 100000
    assert got[("EUROPE", "FRANCE", 0)]["revenue_c10k"] == 100000
    assert got[("AFRICA", "KENYA", 0)]["revenue_c10k"] == 100000
    # per-region subtotals (nation rolled up -> gid 1); NO per-nation-
    # only rows (that is what distinguishes ROLLUP from CUBE)
    assert got[("EUROPE", None, 1)]["revenue_c10k"] == 100000
    assert (None, "FRANCE", 2) not in got
    assert got[(None, None, 3)]["revenue_c10k"] == 200000
    assert len(rows) == 2 + 2 + 1
