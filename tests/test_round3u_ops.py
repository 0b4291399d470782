"""Round-3 batch u: presence-bitmap tier, audience overlap, conversion
hazard, Gini concentration — known-answer and property tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

D = dt.datetime


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return D(2024, 1, 1) + dt.timedelta(days=day, hours=hour)


def test_presence_tier_known_mask(spark):
    from mintpy_spark.operators.bitmap import active_days, presence_tier

    ed0 = (D(2024, 1, 1) - D(1970, 1, 1)).days  # epoch day of day 0
    rows = [(1, _ts(0)), (1, _ts(0, 5)), (1, _ts(3)), (2, _ts(1))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r["user_id"], r["block"]): r
        for r in presence_tier(df)
        .select("user_id", "block", "bitmap", active_days().alias("ad"), "d_min", "d_max")
        .collect()
    }
    b0, bit0 = ed0 // 60, ed0 % 60
    r1 = out[(1, b0)]
    # day 0 twice (same bit) + day 3 -> exactly two bits set
    assert r1["bitmap"] == (1 << bit0) | (1 << (bit0 + 3))
    assert r1["ad"] == 2 and r1["d_min"] == ed0 and r1["d_max"] == ed0 + 3
    assert out[(2, b0)]["ad"] == 1


def test_presence_merge_idempotent_and_equals_direct(spark):
    from mintpy_spark.operators.bitmap import presence_merge, presence_tier

    rows = [(i % 7, _ts(i % 45, i % 24)) for i in range(500)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    direct = presence_tier(df)
    halves = presence_merge(
        presence_tier(df.where(F.col("user_id") % 2 == 0)).unionByName(
            presence_tier(df.where(F.col("user_id") % 2 == 1))
        )
    )
    # merge == direct (loss-free)
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, halves.collect()))
    # replay idempotence: folding the same partial twice is a no-op
    replay = presence_merge(direct.unionByName(direct))
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, replay.collect()))


def test_presence_tier_block_width_guard(spark):
    import pytest

    from mintpy_spark.operators.bitmap import presence_tier

    df = spark.createDataFrame([(1, _ts(0))], "user_id long, ts timestamp")
    with pytest.raises(AssertionError):
        presence_tier(df, block_days=64)  # sign bit would go negative


def test_audience_overlap_known(spark, tmp_path):
    from mintpy_spark.queries_sketch2 import audience_overlap_jaccard

    # users 1,2,3 click; users 2,3,4 view  -> inter=2, union=4 -> 5000bp
    rows = []
    for i, (u, t) in enumerate(
        [(1, "click"), (2, "click"), (3, "click"), (2, "view"), (3, "view"), (4, "view")]
    ):
        rows.append((i, _ts(i), u, t, 1.0, "{}"))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = audience_overlap_jaccard(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["type_a"], r["type_b"]) == ("click", "view")
    assert (r["n_a"], r["n_b"], r["n_inter"], r["jaccard_bp"]) == (3, 3, 2, 5000)


def test_conversion_hazard_known(spark, tmp_path):
    from mintpy_spark.queries_sketch2 import conversion_hazard_daily

    rows = [
        # user 1: click day0, purchase day0 (later) -> offset 0
        (0, _ts(0, 1), 1, "click", 1.0, "{}"),
        (1, _ts(0, 5), 1, "purchase", 1.0, "{}"),
        # user 2: click day0, purchase day2 -> offset 2
        (2, _ts(0), 2, "click", 1.0, "{}"),
        (3, _ts(2), 2, "purchase", 1.0, "{}"),
        # user 3: purchase BEFORE click -> never converts
        (4, _ts(1), 3, "purchase", 1.0, "{}"),
        (5, _ts(2), 3, "click", 1.0, "{}"),
        # user 4: click only -> at risk, never converts
        (6, _ts(0), 4, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["day_offset"]: r for r in conversion_hazard_daily(spark, str(tmp_path)).collect()}
    # cohort = 4 clickers; day 0: 1 of 4 -> 2500bp; day 2: 1 of 3 -> 3333bp
    assert out[0]["n_at_risk"] == 4 and out[0]["n_converted"] == 1
    assert out[0]["hazard_bp"] == 2500
    assert out[2]["n_at_risk"] == 3 and out[2]["hazard_bp"] == 3333
    assert set(out) == {0, 2}


def test_gini_closed_form_vs_naive(spark, tmp_path):
    from mintpy_spark.queries_sketch2 import gini_user_concentration

    # one type, counts [1, 1, 2, 4]: naive numer = sum((2i-n-1)*c)
    # i=1..4, n=4: (-3)*1 + (-1)*1 + (1)*2 + (3)*4 = 10; denom = 4*8=32
    # gini_ppm = round(10/32 * 1e6) = 312500
    rows = []
    eid = 0
    for u, c in [(1, 1), (2, 1), (3, 2), (4, 4)]:
        for k in range(c):
            rows.append((eid, _ts(k), u, "click", 1.0, "{}"))
            eid += 1
    # second type: all equal counts -> gini 0
    for u in range(5):
        rows.append((eid, _ts(u), u, "view", 1.0, "{}"))
        eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["event_type"]: r for r in gini_user_concentration(spark, str(tmp_path)).collect()}
    assert out["click"]["gini_ppm"] == 312500
    assert out["click"]["n_users"] == 4 and out["click"]["n_events"] == 8
    assert out["view"]["gini_ppm"] == 0
