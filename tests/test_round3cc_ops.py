"""Round-3 batch cc: bloom join prune, Wilson bounds, RFM segments —
known-answer fixtures."""

from __future__ import annotations

import datetime as dt
import math

D = dt.datetime


def _orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")


def test_bloom_prune_no_false_negatives(spark, tmp_path):
    from mintpy_spark.queries_sketch2 import PRICE_CUT, bloom_join_prune

    _orders(
        spark,
        tmp_path,
        [(k, 1, "O", PRICE_CUT + 10 if k % 2 == 0 else 10.0, D(1996, 1, 1), "1")
         for k in range(1, 21)],
    )
    li = [
        (k, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", D(1996, 2, 1))
        for k in range(1, 21)
    ]
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    r = bloom_join_prune(spark, str(tmp_path)).collect()[0]
    # every true member passed (no false negatives); fp accounting consistent
    assert r["exact_hits"] == 10 and r["n_probes"] == 20
    assert r["bloom_pass"] >= r["exact_hits"]
    assert r["false_pos"] == r["bloom_pass"] - r["exact_hits"]


def test_wilson_bounds_match_scipy_free_reference(spark, tmp_path):
    from mintpy_spark.queries_sketch2 import conversion_rate_wilson

    d0 = D(2024, 1, 1)
    rows = [(i, d0 + dt.timedelta(minutes=i), 1,
             "purchase" if i < 3 else "click", 1.0, "{}") for i in range(10)]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = conversion_rate_wilson(spark, str(tmp_path)).collect()[0]
    assert (r["n"], r["k"], r["rate_bp"]) == (10, 3, 3000)
    # hand Wilson: z=1.959964, p=0.3, n=10
    z, p, n = 1.959964, 0.3, 10
    den = 1 + z * z / n
    ctr = p + z * z / (2 * n)
    rad = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    assert r["wilson_lo_bp"] == math.floor((ctr - rad) / den * 10000 + 0.5)
    assert r["wilson_hi_bp"] == math.floor((ctr + rad) / den * 10000 + 0.5)
    assert r["wilson_lo_bp"] < r["rate_bp"] < r["wilson_hi_bp"]


def test_rfm_quintiles_known(spark, tmp_path):
    from pyspark.sql import functions as F

    from mintpy_spark.queries_sketch2 import rfm_segments

    # 10 users, user u active on day u with u+1 events of value u*10
    rows, eid = [], 0
    for u in range(10):
        for i in range(u + 1):
            rows.append((eid, D(2024, 1, 1 + u, 1 + i), u, "click", float(u * 10 + 1), "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = rfm_segments(spark, str(tmp_path))
    assert out.agg(F.sum("n_users")).first()[0] == 10
    rows = out.collect()
    # perfectly correlated R/F/M: every cell is on the diagonal r==f==m
    assert all(r["r"] == r["f"] == r["m"] for r in rows)
    assert {r["r"] for r in rows} == {1, 2, 3, 4, 5}
