"""Round-3 batch v: rolling-active engagement, time-in-state census,
containment near-dup — known-answer and property tests."""

from __future__ import annotations

import datetime as dt

D = dt.datetime


def _ts(day: int, sec: int = 0) -> dt.datetime:
    return D(2024, 1, 1) + dt.timedelta(days=day, seconds=sec)


def test_daily_actives_known(spark):
    from mintpy_spark.operators.engagement import daily_actives

    # u1: days 0 and 3; u2: day 0; u3: day 8
    rows = [(1, _ts(0)), (1, _ts(0, 60)), (1, _ts(3)), (2, _ts(0)), (3, _ts(8))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["ed"]: r for r in daily_actives(df, window=7).collect()}
    ed0 = (D(2024, 1, 1) - D(1970, 1, 1)).days
    assert set(out) == {ed0, ed0 + 3, ed0 + 8}  # only days with activity
    # day 0: dau {u1,u2}, trailing-7 wau identical
    assert (out[ed0]["dau"], out[ed0]["wau"], out[ed0]["stickiness_bp"]) == (2, 2, 10000)
    # day 3: dau {u1}; wau {u1,u2} — u1 active twice in-window counts ONCE
    assert (out[ed0 + 3]["dau"], out[ed0 + 3]["wau"]) == (1, 2)
    assert out[ed0 + 3]["stickiness_bp"] == 5000
    # day 8: u1's day-3 activity still inside [2, 8]
    assert (out[ed0 + 8]["dau"], out[ed0 + 8]["wau"]) == (1, 2)


def test_daily_actives_window_1_is_dau(spark):
    from pyspark.sql import functions as F

    from mintpy_spark.operators.engagement import daily_actives

    rows = [(i % 5, _ts(i % 9, i)) for i in range(200)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = daily_actives(df, window=1)
    assert out.where(F.col("dau") != F.col("wau")).count() == 0
    assert out.where(F.col("stickiness_bp") != 10000).count() == 0


def test_state_dwell_known(spark):
    from mintpy_spark.operators.engagement import state_dwell

    rows = [
        (1, 1, "A", _ts(0, 0)),
        (1, 2, "B", _ts(0, 10)),
        (1, 3, "A", _ts(0, 25)),  # last event per user: no dwell
        (2, 4, "A", _ts(0, 0)),   # singleton user: no dwell at all
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, event_type string, ts timestamp")
    out = {r["state"]: r for r in state_dwell(df).collect()}
    assert set(out) == {"A", "B"}
    assert (out["A"]["entries"], out["A"]["total_us"]) == (1, 10_000_000)
    assert (out["B"]["entries"], out["B"]["total_us"]) == (1, 15_000_000)
    assert out["B"]["max_us"] == out["B"]["mean_us"] == 15_000_000


def test_state_dwell_tiebreak_on_event_id(spark):
    from mintpy_spark.operators.engagement import state_dwell

    # X and Y share a timestamp: event_id orders X before Y, so X dwells
    # 0 us into Y and Y dwells 5 s into Z — deterministic, oracle-identical
    rows = [
        (3, 1, "X", _ts(0, 0)),
        (3, 2, "Y", _ts(0, 0)),
        (3, 3, "Z", _ts(0, 5)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, event_type string, ts timestamp")
    out = {r["state"]: r for r in state_dwell(df).collect()}
    assert (out["X"]["total_us"], out["Y"]["total_us"]) == (0, 5_000_000)
    assert "Z" not in out


def test_containment_subset_pair_full_score(spark):
    from mintpy_spark.operators.dedup import containment_near_dups

    base = " ".join(f"w{i}" for i in range(40))
    quote = " ".join(f"w{i}" for i in range(10, 20))  # contiguous quote of A
    other = " ".join(f"q{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base), (2, quote), (3, other)], "doc_id long, text string"
    )
    out = containment_near_dups(df, threshold_bp=5000).collect()
    assert len(out) == 1
    r = out[0]
    # every shingle of the quote lies inside the base doc -> containment 1
    assert (r["doc_a"], r["doc_b"], r["containment_bp"]) == (1, 2, 10000)
    assert r["n_b"] == 8 and r["inter"] == 8  # 10 words -> 8 shingles
    # Jaccard would be 8/38 ~ 0.21: below any 0.5 bar — containment-only pair
    assert r["n_a"] == 38


def test_containment_stop_shingle_cut(spark):
    from mintpy_spark.operators.dedup import containment_near_dups

    # the shared phrase appears in every doc -> df = 6 > max_df=3 -> cut;
    # no discriminative overlap remains, so no pair may surface
    docs = [(i, f"common one two u{i} v{i} w{i} x{i}") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    assert containment_near_dups(df, max_df=3, threshold_bp=1).count() == 0
    # raising the cap re-admits the phrase and every pair shares it
    assert containment_near_dups(df, max_df=6, threshold_bp=1).count() == 15
