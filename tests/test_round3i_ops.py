"""Round-3 batch i: curation (decontamination, Gopher flags), burst
detection, winsorized rollup — known-answer tests."""

from __future__ import annotations

import datetime as dt


def test_decontaminate_known_docs(spark):
    from mintpy_spark.operators.curation import decontaminate

    # mod=2: even ids are the benchmark slice, odd ids are training.
    docs = spark.createDataFrame(
        [
            (0, "a b c d e"),          # benchmark: windows abc bcd cde
            (1, "a b c x y"),          # hits: "a b c" only -> 1 of 3
            (3, "p q r s t"),          # no hits -> 0 of 3
            (5, "a b"),                # < k tokens: no windows, omitted
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in decontaminate(docs, k=3, mod=2).collect()
    }
    assert set(rows) == {1, 3}
    assert rows[1]["n_windows"] == 3
    assert rows[1]["hit_windows"] == 1
    assert rows[1]["hit_bp"] == 3333  # floor(1/3*1e4 + .5)
    assert rows[1]["contaminated"] == 1
    assert rows[3]["hit_windows"] == 0
    assert rows[3]["contaminated"] == 0


def test_gopher_flags_known_text(spark):
    from mintpy_spark.operators.curation import gopher_flags

    good = " ".join(["the", "of", "and"] + ["word"] * 47)  # 50 words
    short = "the of tiny text"                             # wc fails
    nostop = " ".join(["zz"] * 60)                         # stop fails, mwl=2 fails
    symbols = " ".join(["the", "of"] + ["#tag"] * 48)      # 48 '#' > 5 -> symbol fails
    docs = spark.createDataFrame(
        [(0, good), (1, short), (2, nostop), (3, symbols)],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in gopher_flags(docs).collect()}
    assert r[0]["n_words"] == 50 and r[0]["n_stop"] == 3
    assert (
        r[0]["flag_wc"], r[0]["flag_mwl"], r[0]["flag_symbol"],
        r[0]["flag_alpha"], r[0]["flag_stop"], r[0]["pass_all"],
    ) == (1, 1, 1, 1, 1, 1)
    assert r[1]["flag_wc"] == 0 and r[1]["pass_all"] == 0
    assert r[2]["flag_stop"] == 0 and r[2]["flag_mwl"] == 0
    assert r[3]["flag_symbol"] == 0 and r[3]["pass_all"] == 0


def test_burst_ratio_known_series(spark):
    from mintpy_spark.operators.anomaly import burst_ratio_daily

    rows = []
    eid = 0
    # 7 days x 10 events, then a 20-event day (2x baseline)
    for d in range(7):
        for i in range(10):
            rows.append((eid, dt.datetime(2024, 1, 1 + d, 1, i), "a"))
            eid += 1
    for i in range(20):
        rows.append((eid, dt.datetime(2024, 1, 8, 1, i), "a"))
        eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {
        r["bucket_day"].day: r
        for r in burst_ratio_daily(ev, key="event_type", ts="ts").collect()
    }
    assert out[1]["m_prev"] == 0 and out[1]["burst"] == 0
    assert out[1]["ratio_bp"] is None
    assert out[2]["s_prev"] == 10 and out[2]["m_prev"] == 1
    assert out[2]["ratio_bp"] == 10000 and out[2]["burst"] == 0
    d8 = out[8]
    assert d8["s_prev"] == 70 and d8["m_prev"] == 7
    assert d8["ratio_bp"] == 20000  # 20*7/70 = 2x
    assert d8["burst"] == 1


def test_burst_range_frame_ages_out_gaps(spark):
    from mintpy_spark.operators.anomaly import burst_ratio_daily

    # day 1 active, 9-day silence, day 11 active: baseline must be empty
    # (RANGE over calendar days, not ROWS over active days).
    ev = spark.createDataFrame(
        [(0, dt.datetime(2024, 1, 1), "a"), (1, dt.datetime(2024, 1, 11), "a")],
        "event_id long, ts timestamp, event_type string",
    )
    out = {
        r["bucket_day"].day: r
        for r in burst_ratio_daily(ev, key="event_type", ts="ts").collect()
    }
    assert out[11]["m_prev"] == 0 and out[11]["burst"] == 0


def test_winsorized_daily_known_values(spark):
    from mintpy_spark.operators.robust import winsorized_daily_stats

    # one day, v = 0..10: p05 = 0.5, p95 = 9.5 (linear interpolation),
    # clamped sum = 0.5 + 1..9 + 9.5 = 55; raw sum = 55 too, but the
    # quantized partials differ: floor(.5*100+.5)=50, floor(9.5*100+.5)=950
    ev = spark.createDataFrame(
        [(i, dt.datetime(2024, 3, 1, 2, i), float(i)) for i in range(11)],
        "event_id long, ts timestamp, value double",
    )
    r = winsorized_daily_stats(ev).collect()
    assert len(r) == 1
    row = r[0]
    assert row["n"] == 11
    assert row["p_lo_c"] == 50 and row["p_hi_c"] == 950
    assert row["rsum_c"] == 5500
    # clamped: 50 + 100..900 (steps of 100) + 950 = 5500
    assert row["wsum_c"] == 50 + sum(range(100, 1000, 100)) + 950


def test_winsorized_skips_null_and_nan(spark):
    from mintpy_spark.operators.robust import winsorized_daily_stats

    ev = spark.createDataFrame(
        [
            (0, dt.datetime(2024, 3, 1), 1.0),
            (1, dt.datetime(2024, 3, 1), None),
            (2, dt.datetime(2024, 3, 1), float("nan")),
            (3, dt.datetime(2024, 3, 1), 3.0),
        ],
        "event_id long, ts timestamp, value double",
    )
    row = winsorized_daily_stats(ev).collect()[0]
    assert row["n"] == 2 and row["rsum_c"] == 400
