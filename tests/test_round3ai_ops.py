"""Batch ai planted truth: BM25 ranking behavior, BPE pair census on a
hand fixture, Siegel repeated-median robustness past Theil-Sen's
breakdown point, and hi/lo tie determinism."""

from __future__ import annotations

import datetime as dt
import math
import random

from pyspark.sql import functions as F


def _bm25_expected(corpus: dict[str, list[str]], terms: list[str],
                   k1: float = 1.2, b: float = 0.75) -> dict[str, int]:
    """Pure-Python mirror of the engine's fixed op order."""
    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / float(n)
    scores: dict[str, int] = {}
    for doc, toks in corpus.items():
        dl = len(toks)
        s = 0
        for term in terms:
            tf = toks.count(term)
            if tf == 0:
                continue
            df = sum(1 for t in corpus.values() if term in t)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            tfn = (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * dl / avgdl)
            )
            s += int(math.floor(idf * tfn * 1000000.0 + 0.5))
        if s or any(t in toks for t in terms):
            scores[doc] = s
    return scores


def test_bm25_ranking_and_scores(spark):
    from mintpy_spark.operators.tfidf import bm25_topk

    corpus = {
        "d1": "apple banana banana".split(),
        "d2": "apple apple apple apple".split(),
        "d3": "cherry".split(),
        "d4": "apple cherry cherry cherry cherry cherry cherry".split(),
    }
    docs = spark.createDataFrame(
        [(k, " ".join(v)) for k, v in corpus.items()], "doc_id string, text string"
    )
    rows = bm25_topk(docs, ["apple", "banana"], top_k=10).collect()
    got = {r.doc_id: r.score_micro for r in rows}
    assert got == _bm25_expected(corpus, ["apple", "banana"])
    # ranking: d1 carries the rare term banana -> highest; d4 is the
    # longest doc with a single tf=1 hit -> lowest; d3 never appears
    order = [r.doc_id for r in sorted(rows, key=lambda r: r.rank)]
    assert order[0] == "d1" and order[-1] == "d4" and "d3" not in order
    n_terms = {r.doc_id: r.n_terms for r in rows}
    assert n_terms == {"d1": 2, "d2": 1, "d4": 1}


def test_bm25_length_normalization(spark):
    """Same tf, longer doc -> strictly lower BM25 score."""
    from mintpy_spark.operators.tfidf import bm25_topk

    docs = spark.createDataFrame(
        [("short", "hit pad"), ("long", "hit " + "pad " * 20)],
        "doc_id string, text string",
    )
    rows = {r.doc_id: r for r in bm25_topk(docs, ["hit"]).collect()}
    assert rows["short"].score_micro > rows["long"].score_micro
    assert rows["short"].rank == 1


def test_adjacent_pair_census_fixture(spark):
    from mintpy_spark.operators.tfidf import adjacent_pair_census

    docs = spark.createDataFrame(
        [
            ("en", "a b a b"),      # (a,b) x2, (b,a) x1
            ("en", "a b"),          # (a,b) -> 3 total
            ("en", "c c c"),        # (c,c) x2
            ("fr", "x y"),
            ("fr", "solo"),         # size < 2: contributes nothing
            ("fr", ""),             # empty: contributes nothing
        ],
        "lang string, text string",
    )
    rows = adjacent_pair_census(docs, group="lang", top_k=3).collect()
    got = {(r.lang, r.rnk): (r.w1, r.w2, r.cnt) for r in rows}
    assert got == {
        ("en", 1): ("a", "b", 3),
        ("en", 2): ("c", "c", 2),
        ("en", 3): ("b", "a", 1),
        ("fr", 1): ("x", "y", 1),
    }


def _series(slope: float, n: int, corrupt: set[int], rng: random.Random):
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(n):
        ts = t0 + dt.timedelta(hours=6 * i)
        years = 6 * i / (24.0 * 365.25)
        if i in corrupt:
            # the corrupted epochs lie on their OWN steep line — the
            # one-sided layout that actually exhausts a breakdown point
            # (symmetric noise leaves every pairwise-median estimator
            # untouched: the clean slopes stay in the middle)
            v = 5.0e5 - 50000.0 * years + rng.gauss(0, 10.0)
        else:
            v = 100.0 + slope * years
        rows.append((ts, v))
    return rows


def test_siegel_survives_40pct_corruption_where_theilsen_breaks(spark):
    """Planted line at slope 3000/yr whose LAST 40% of epochs are
    replaced by a different steep line: 40% one-sided corruption poisons
    ~65% of all PAIRS, past Theil-Sen's 29.3% breakdown, while the
    repeated median (50% breakdown) still recovers the slope — most
    clean centers keep a majority-clean in-band neighbor set."""
    from mintpy_spark.operators.robust import siegel_velocity, theil_sen_velocity

    rng = random.Random(7)
    n = 30
    # 13/30 corrupted: clean pairs C(17,2)=136 + corrupt-corrupt 78 = 214
    # of 435 — the median pair (rank 218) falls in the clean->corrupt
    # cross region, so Theil-Sen must break; 16 of 17 clean centers keep
    # a majority-clean band, so the repeated median must not.
    corrupt = set(range(17, 30))
    rows = [("k", ts, v) for ts, v in _series(3000.0, n, corrupt, rng)]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, value double")
    sg = siegel_velocity(df, "value", max_lag=10).collect()[0]
    assert abs(sg.velocity - 3000.0) < 1.0, sg.velocity
    ts_ = theil_sen_velocity(df, "value", max_lag=None).collect()[0]
    assert abs(ts_.velocity - 3000.0) > 1000.0, (
        "corruption level chosen to break Theil-Sen; it did not break -> "
        "the test no longer discriminates"
    )


def test_siegel_matches_numpy_repeated_median(spark):
    """Exact check of the nested-median arithmetic on a clean small
    series against a literal python repeated median (same symmetric
    band, same interpolation convention)."""
    from mintpy_spark.functions.timefn import decimal_year  # noqa: F401
    from mintpy_spark.operators.robust import siegel_velocity

    rng = random.Random(3)
    rows = [("k", ts, v + rng.gauss(0, 5.0))
            for ts, v in _series(500.0, 12, set(), rng)]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, value double")
    got = siegel_velocity(df, "value", max_lag=10).collect()[0]

    # python mirror: decimal-year via the same 365.25 convention
    def dy(ts: dt.datetime) -> float:
        doy = ts.timetuple().tm_yday
        return ts.year + (
            doy - 1 + ts.hour / 24.0 + ts.minute / 1440.0 + ts.second / 86400.0
        ) / 365.25

    pts = sorted((dy(ts) - 2024.0, v) for _, ts, v in rows)

    def med(xs: list[float]) -> float:
        xs = sorted(xs)
        m = len(xs)
        if m % 2 == 1:
            return xs[m // 2]
        lo, hi = xs[m // 2 - 1], xs[m // 2]
        return lo + (hi - lo) * 0.5

    mis = []
    for i, (ti, vi) in enumerate(pts):
        sl = [
            (vj - vi) / (tj - ti)
            for j, (tj, vj) in enumerate(pts)
            if j != i and abs(j - i) <= 10 and tj != ti
        ]
        if sl:
            mis.append(med(sl))
    assert got.num_points == len(mis)
    assert abs(got.velocity - med(mis)) < 1e-9


def test_hilo_tie_breaks_to_earliest_timestamp(spark):
    from mintpy_spark.operators.rollup import rollup_hilo

    t0 = dt.datetime(2024, 5, 1, 10)
    rows = [
        ("u", t0, 5.0),
        ("u", t0 + dt.timedelta(hours=1), 5.0),   # tied max, later
        ("u", t0 + dt.timedelta(hours=2), 1.0),
        ("u", t0 + dt.timedelta(hours=3), 1.0),   # tied min, later
        ("u", t0 + dt.timedelta(hours=4), None),  # excluded
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, value double")
    r = rollup_hilo(df, "value", "1d").collect()[0]
    assert (r.hi_v, r.hi_t) == (5.0, t0)
    assert (r.lo_v, r.lo_t) == (1.0, t0 + dt.timedelta(hours=2))
    assert r.cnt == 4
