"""Unit tests for the batch-e operators: counter rate, inter-arrival CV,
TF-IDF top terms."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def test_counter_rate_span_and_reset(spark):
    from mintpy_spark.operators.counter import counter_rate

    rows = [
        ("u", _ts(0), 100),
        ("u", _ts(50), 200),    # +100
        ("u", _ts(100), 40),    # reset -> +40
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, c long")
    r = counter_rate(df, "c", tier="30d").collect()[0]
    assert r.increase == 140
    assert r.span_us == 100_000_000
    assert r.rate == pytest.approx(1.4)


def test_counter_rate_single_sample_null(spark):
    from mintpy_spark.operators.counter import counter_rate

    df = spark.createDataFrame(
        [("u", _ts(0), 7)], "url string, warc_ts timestamp, c long"
    )
    r = counter_rate(df, "c", tier="1d").collect()[0]
    assert r.span_us == 0 and r.rate is None


def test_interarrival_cv_metronomic_and_bursty(spark):
    from mintpy_spark.operators.cadence import interarrival_stats

    rows = (
        [("m", _ts(i * 60)) for i in range(5)]          # perfect 60 s cadence
        + [("b", _ts(s)) for s in (0, 1, 2, 3, 3600)]   # burst then silence
    )
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp")
    out = {r.url: r for r in interarrival_stats(df).collect()}
    assert out["m"].cv == 0.0 and out["m"].mean_gap_s == 60.0
    # bursty: gaps 1,1,1,3597 -> CV ~ sqrt(var)/mean, well above 1
    gaps = [1, 1, 1, 3597]
    mean = sum(gaps) / 4
    var = sum((g - mean) ** 2 for g in gaps) / 3
    assert out["b"].cv == pytest.approx(math.sqrt(var) / mean, abs=1e-3)
    assert out["b"].n_gaps == 4


def test_interarrival_degenerate_series_dropped(spark):
    from mintpy_spark.operators.cadence import interarrival_stats

    rows = [("one", _ts(0)), ("dup", _ts(5)), ("dup", _ts(5))]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp")
    # "one" has no gaps; "dup" has a single 0-gap (s1=0) — both undefined
    assert interarrival_stats(df).count() == 0


def test_tfidf_top_terms_known_corpus(spark):
    from mintpy_spark.operators.tfidf import tfidf_top_terms

    rows = [
        (1, "a", "common spark spark"),
        (2, "a", "common"),
        (3, "b", "common duck"),
        (4, "b", "common duck duck goose"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = tfidf_top_terms(docs, group="source", k=3).collect()
    by = {(r.source, r.rank): r for r in out}
    # 'common' is in every doc (df = N) -> excluded outright, never
    # padding the characteristic-term list with score-0 rows
    assert all(r.term != "common" for r in out)
    # N=4; 'common' in all 4 docs -> idf=0 -> never outranks group terms
    assert by[("a", 1)].term == "spark"
    assert by[("a", 1)].tf == 2 and by[("a", 1)].df == 1
    assert by[("a", 1)].score == pytest.approx(2 * math.log(4), abs=1e-6)
    assert by[("b", 1)].term == "duck"
    assert by[("b", 1)].score == pytest.approx(3 * math.log(2), abs=1e-6)
    assert by[("b", 2)].term == "goose"
    # no group has 3 positive-score terms: short lists, not score-0 pad
    assert ("a", 3) not in by and ("b", 3) not in by
    assert ("a", 2) not in by  # 'a' has exactly one characteristic term


def test_counter_rate_subsecond_burst(spark):
    # 3 samples inside one second: microsecond spans keep the rate real
    from mintpy_spark.operators.counter import counter_rate

    rows = [
        ("u", _ts(0) + dt.timedelta(microseconds=100_000), 0),
        ("u", _ts(0) + dt.timedelta(microseconds=500_000), 40),
        ("u", _ts(0) + dt.timedelta(microseconds=900_000), 80),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, c long")
    r = counter_rate(df, "c", tier="1d").collect()[0]
    assert r.increase == 80
    assert r.span_us == 800_000
    assert r.rate == pytest.approx(100.0)  # 80 over 0.8 s
