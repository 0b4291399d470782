"""Round-4 batch f planted truth: CUBE grouping levels and gid bits."""

from __future__ import annotations


def test_olap_cube_revenue_grouping_levels(spark):
    import os
    import tempfile

    from mintpy_spark.queries_tpch import olap_cube_revenue

    c = spark.createDataFrame(
        [(1, "BUILDING", 10), (2, "AUTO", 20)],
        "c_custkey long, c_mktsegment string, c_nationkey long",
    )
    n = spark.createDataFrame(
        [(10, "FRANCE"), (20, "KENYA")], "n_nationkey long, n_name string"
    )
    o = spark.createDataFrame(
        [(100, 1, "1997-02-01"), (200, 2, "1997-03-01"),
         (300, 1, "1990-01-01")],  # pre-cutoff order filtered out
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).selectExpr("o_orderkey", "o_custkey", "CAST(o_orderdate AS TIMESTAMP) o_orderdate")
    li = spark.createDataFrame(
        [(100, 10.00, 0.10), (100, 5.00, 0.00), (200, 8.00, 0.25),
         (300, 99.0, 0.0)],
        "l_orderkey long, l_extendedprice double, l_discount double",
    )
    with tempfile.TemporaryDirectory() as d:
        for name, df in (("customer", c), ("nation", n), ("orders", o),
                         ("lineitem", li)):
            df.coalesce(1).write.parquet(os.path.join(d, f"{name}.parquet"))
        rows = olap_cube_revenue(spark, d).collect()

    got = {(r.n_name, r.c_mktsegment, r.gid): r.asDict() for r in rows}
    # cell level (gid 0): FRANCE/BUILDING = 1000*90 + 500*100 = 140000
    assert got[("FRANCE", "BUILDING", 0)]["revenue_c10k"] == 140000
    assert got[("FRANCE", "BUILDING", 0)]["n_orders"] == 1
    assert got[("KENYA", "AUTO", 0)]["revenue_c10k"] == 800 * 75
    # per-nation rollup (segment aggregated -> low bit set)
    assert got[("FRANCE", None, 1)]["revenue_c10k"] == 140000
    # per-segment rollup (nation aggregated -> high bit set)
    assert got[(None, "AUTO", 2)]["revenue_c10k"] == 60000
    # grand total (gid 3): both
    assert got[(None, None, 3)]["revenue_c10k"] == 200000
    assert got[(None, None, 3)]["n_orders"] == 2
    assert len(rows) == 2 + 2 + 2 + 1
