"""Round-3 late operators: M4 downsample, KMV sketch, counter increase,
sliding-from-tier. Property-level checks beyond the driver oracles."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _series(spark, rows):
    return spark.createDataFrame(rows, "url string, warc_ts timestamp, v double")


def test_m4_picks_first_min_max_last(spark):
    from mintpy_spark.operators.downsample import m4_downsample

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", t0 + dt.timedelta(hours=1), 5.0),
        ("a", t0 + dt.timedelta(hours=2), 1.0),
        ("a", t0 + dt.timedelta(hours=3), 9.0),
        ("a", t0 + dt.timedelta(hours=4), 4.0),
        ("a", t0 + dt.timedelta(days=1, hours=1), 7.0),
    ]
    out = m4_downsample(_series(spark, rows), "v", tier="1d", key="url", ts="warc_ts")
    d0 = out.where(F.col("bucket_start") == t0).first()
    assert (d0.v_first, d0.v_min, d0.v_max, d0.v_last, d0.cnt) == (5.0, 1.0, 9.0, 4.0, 4)
    d1 = out.where(F.col("bucket_start") == t0 + dt.timedelta(days=1)).first()
    assert (d1.v_first, d1.v_min, d1.v_max, d1.v_last, d1.cnt) == (7.0, 7.0, 7.0, 7.0, 1)


def test_kmv_merge_equals_direct_sketch(spark):
    """The merge theorem on real data: 1h-sketch -> merged 1d sketch ==
    1d sketch built directly from raw rows, element for element."""
    from mintpy_spark.operators.sketch import kmv_merge, kmv_tier

    ev = spark.range(0, 5000).select(
        (F.col("id") % 700).cast("string").alias("item"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 37).alias("warc_ts"),
    )
    k = 16
    direct = kmv_tier(ev, "item", tier="1d", key_cols=(), ts="warc_ts", k=k)
    merged = kmv_merge(
        kmv_tier(ev, "item", tier="1h", key_cols=(), ts="warc_ts", k=k), "1d", (), k=k
    )
    j = direct.alias("d").join(merged.alias("m"), "bucket_start")
    assert j.count() == direct.count() > 0
    assert j.where(F.col("d.kmv") != F.col("m.kmv")).count() == 0


def test_kmv_estimate_exact_below_k_and_close_above(spark):
    from mintpy_spark.operators.sketch import kmv_estimate, kmv_tier

    k = 64
    ev = spark.range(0, 20000).select(
        (F.col("id") % 1000).cast("string").alias("item"),
        F.timestamp_seconds(F.lit(1704067200) + (F.col("id") % 3600)).alias("warc_ts"),
    )
    est = kmv_estimate(kmv_tier(ev, "item", tier="1d", ts="warc_ts", k=k), k=k).first()
    # 1000 true distinct: KMV with k=64 should land within ~25%
    assert 750 <= est.est_distinct <= 1250
    small = spark.range(0, 10).select(
        F.col("id").cast("string").alias("item"),
        F.timestamp_seconds(F.lit(1704067200)).alias("warc_ts"),
    )
    est2 = kmv_estimate(kmv_tier(small, "item", tier="1d", ts="warc_ts", k=k), k=k).first()
    assert est2.est_distinct == 10.0 and est2.n_kept == 10


def test_counter_increase_handles_resets(spark):
    from mintpy_spark.operators.counter import counter_increase

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", t0 + dt.timedelta(minutes=m), c)
        for m, c in [(0, 100), (10, 150), (20, 30), (30, 80)]  # reset at 20min
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, ctr long")
    out = counter_increase(df, "ctr", tier="1d", key="url", ts="warc_ts").first()
    # increase = (150-100) + 30 (reset: climb unobservable) + (80-30) = 130
    assert out.increase == 130 and out.n_resets == 1 and out.n_samples == 4


def test_sliding_from_tier_matches_raw_window(spark):
    from mintpy_spark.operators.downsample import sliding_from_tier
    from mintpy_spark.operators.rollup import rollup_from_obs

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", t0 + dt.timedelta(days=d, hours=h), float(d * 10 + h))
        for d in (0, 1, 2, 9, 10)
        for h in (1, 13)
    ]
    obs = _series(spark, rows)
    t1d = rollup_from_obs(obs, "v", "1d", key="url", ts="warc_ts")
    out = {
        r.bucket_start: r
        for r in sliding_from_tier(t1d, "1d", trailing=7, key="url").collect()
    }
    # day 2 window covers days 0..2 (6 obs); day 9 covers only day 9 (gap > 7d)
    assert out[t0 + dt.timedelta(days=2)].w_cnt == 6
    assert out[t0 + dt.timedelta(days=9)].w_cnt == 2
    assert out[t0 + dt.timedelta(days=10)].w_cnt == 4
    d2 = out[t0 + dt.timedelta(days=2)]
    assert d2.w_vmin == 1.0 and d2.w_vmax == 33.0
