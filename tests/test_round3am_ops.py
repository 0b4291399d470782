"""Batch am planted truth: interpolated as-of alignment — exact linear
values between brackets, LOCF/NOCB edges, exact-timestamp hits, and
keys with no signal at all."""

from __future__ import annotations

import datetime as dt


def _t(s: float) -> dt.datetime:
    return dt.datetime(2024, 4, 1) + dt.timedelta(seconds=s)


def test_asof_interpolate_brackets_and_edges(spark):
    from mintpy_spark.operators.asof import asof_interpolate

    obs = spark.createDataFrame(
        [
            ("u", _t(10.0), 1, 100.0),
            ("u", _t(20.0), 2, 200.0),
            ("u", _t(40.0), 3, 100.0),
        ],
        "url string, warc_ts timestamp, event_id long, value double",
    )
    probes = spark.createDataFrame(
        [
            ("u", _t(5.0), 10),    # before first obs -> nocb 100
            ("u", _t(10.0), 11),   # exactly at obs -> interp, factor 0 -> 100
            ("u", _t(15.0), 12),   # halfway 10..20 -> 150
            ("u", _t(25.0), 13),   # quarter 20..40 -> 175
            ("u", _t(50.0), 14),   # past last -> locf 100
            ("v", _t(0.0), 15),    # key with no signal -> none/NULL
        ],
        "url string, warc_ts timestamp, event_id long",
    )
    got = {
        r.event_id: (r.v_interp, r.method)
        for r in asof_interpolate(
            probes, obs, key="url", ts="warc_ts", value_col="value",
            order_cols=("event_id",),
        ).collect()
    }
    assert got[10] == (100.0, "nocb")
    assert got[11] == (100.0, "interp")
    assert got[12] == (150.0, "interp")
    assert got[13] == (175.0, "interp")
    assert got[14] == (100.0, "locf")
    assert got[15] == (None, "none")


def test_asof_interpolate_null_signal_value_propagates(spark):
    """A NULL-valued observation IS the bracket (same convention as
    asof_join): interpolation through it yields NULL, not a skip."""
    from mintpy_spark.operators.asof import asof_interpolate

    obs = spark.createDataFrame(
        [("u", _t(0.0), 1, 10.0), ("u", _t(10.0), 2, None)],
        "url string, warc_ts timestamp, event_id long, value double",
    )
    probes = spark.createDataFrame(
        [("u", _t(5.0), 9)],
        "url string, warc_ts timestamp, event_id long",
    )
    r = asof_interpolate(
        probes, obs, key="url", ts="warc_ts", value_col="value",
        order_cols=("event_id",),
    ).collect()[0]
    assert r.method == "interp" and r.v_interp is None
