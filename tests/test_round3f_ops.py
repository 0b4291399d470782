"""Unit tests for batch-f: STL-lite decomposition and unigram log-prob
document scoring."""

from __future__ import annotations

import datetime as dt
import math

import pytest

T0 = dt.datetime(2024, 1, 1)


def test_stl_decompose_recovers_planted_components(spark):
    # value = trend(linear) + seasonal(hour-of-day) + 0 noise; a centered
    # moving average is exact on a linear trend, so the decomposition
    # recovers both components up to the seasonal's zero-mean shift
    from mintpy_spark.operators.seasonal import stl_decompose

    season = {h: 5.0 if h % 24 < 12 else -5.0 for h in range(24)}
    rows = []
    for i in range(24 * 8):  # 8 days hourly
        ts = T0 + dt.timedelta(hours=i)
        rows.append(("u", ts, 0.5 * i + season[ts.hour]))
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, value double")
    out = stl_decompose(df, "value", half_window=12).collect()
    assert len(out) == 24 * 8 - 24  # edge rows (no full +-12 frame) dropped
    # seasonal has period 24 == window 25 minus 1... the +-12 window spans
    # 25 hours, so the MA of the +-5 square wave is +-0.2, not 0 — but the
    # residual must still be ~0 everywhere (components are consistent)
    for r in out:
        assert abs(r.residual) < 0.3, r
    # trend tracks the line within the seasonal MA leakage
    for r in out:
        i = (r.warc_ts - T0).total_seconds() / 3600
        assert abs(r.trend - 0.5 * i) < 0.5, r


def test_stl_full_window_requirement(spark):
    from mintpy_spark.operators.seasonal import stl_decompose

    rows = [("u", T0 + dt.timedelta(hours=i), 1.0) for i in range(10)]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, value double")
    # 10 rows < 2*12+1: no row has a full frame
    assert stl_decompose(df, "value", half_window=12).count() == 0
    # constant series with a full frame: trend=value, seasonal=residual=0
    rows = [("u", T0 + dt.timedelta(hours=i), 2.5) for i in range(30)]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, value double")
    got = stl_decompose(df, "value", half_window=12).collect()
    assert len(got) == 30 - 24
    for r in got:
        assert (r.trend, r.seasonal, r.residual) == (2.5, 0.0, 0.0)


def test_unigram_logprob_known_corpus(spark):
    from mintpy_spark.operators.tfidf import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a rare"), (3, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_logprob(docs).collect()}
    assert 3 not in out  # empty doc excluded
    # corpus: a=4, b=1, rare=1, T=6
    lp = {t: math.log(c / 6) for t, c in (("a", 4), ("b", 1), ("rare", 1))}
    q = lambda x: math.floor(x * 1e6 + 0.5)  # micro-nat quantization
    exp1 = round((3 * q(lp["a"]) + q(lp["b"])) / (4 * 1e6), 4)
    exp2 = round((q(lp["a"]) + q(lp["rare"])) / (2 * 1e6), 4)
    assert out[1].n_tokens == 4 and out[1].logprob == pytest.approx(exp1)
    assert out[2].n_tokens == 2 and out[2].logprob == pytest.approx(exp2)
    # the rare-token doc scores lower: the quality-filter ordering
    assert out[2].logprob < out[1].logprob
