"""URL canonicalization: every normalization rule pinned by example.

The canonicalizer runs before the per-url groupBy at 10^12 rows, so a
missed rule silently fractures tier series; these cases pin each rule
(fragment, tracking params, host case, default ports, duplicate and
trailing slashes, root form) and the non-rules (real params survive,
path case is preserved).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mintpy_spark.operators.urltools import (
    canonical_url_dups,
    canonicalize_url,
    url_host,
    url_path_depth,
    url_registered_domain,
)

BASE = "https://domain001.example.com/page/42"

CASES = [
    # (raw, canonical)
    (BASE, BASE),
    (BASE + "#section2", BASE),                                # fragment
    (BASE + "?utm_source=feed&utm_campaign=x", BASE),          # all-tracking query
    (BASE + "/", BASE),                                        # trailing slash
    ("HTTPS://DOMAIN001.EXAMPLE.COM/page/42", BASE),           # scheme+host case
    ("https://domain001.example.com:443/page/42", BASE),       # default https port
    ("http://h.example.com:80/a", "http://h.example.com/a"),   # default http port
    ("https://domain001.example.com/page//42", BASE),          # duplicate slash
    (BASE + "?ref=tw#top", BASE),                              # tracking + fragment
    (BASE + "?q=1&utm_medium=email", BASE + "?q=1"),           # real param survives
    (BASE + "?utm_term=a&q=2&gclid=9", BASE + "?q=2"),         # tracking mid-query
    ("https://domain001.example.com/", "https://domain001.example.com"),  # root
    ("https://domain001.example.com", "https://domain001.example.com"),
    ("https://h.example.com/PaGe/42", "https://h.example.com/PaGe/42"),  # path case kept
    ("https://h.example.com:8080/a", "https://h.example.com:8080/a"),    # real port kept
]


@pytest.fixture(scope="module")
def urls(spark):
    df = spark.createDataFrame([(r, c) for r, c in CASES], ["raw", "expected"])
    return df.select(
        "raw",
        "expected",
        canonicalize_url(F.col("raw")).alias("canon"),
        url_host(F.col("raw")).alias("host"),
        url_registered_domain(F.col("raw")).alias("reg"),
        url_path_depth(F.col("raw")).alias("depth"),
    ).collect()


def test_canonicalize_rules(urls):
    for r in urls:
        assert r.canon == r.expected, f"{r.raw!r} -> {r.canon!r} != {r.expected!r}"


def test_host_lowercased_portless(urls):
    for r in urls:
        assert r.host == r.host.lower()
        assert ":" not in r.host
        assert r.reg == "example.com"


def test_path_depth_filters_empty_segments(spark):
    df = spark.createDataFrame(
        [
            ("https://h.example.com", 0),
            ("https://h.example.com/", 0),
            ("https://h.example.com/a", 1),
            ("https://h.example.com/a/", 1),
            ("https://h.example.com/a//b/c?x=1", 3),
        ],
        ["raw", "want"],
    )
    got = df.select("want", url_path_depth(F.col("raw")).alias("depth")).collect()
    for r in got:
        assert r.depth == r.want


def test_canonical_dups_collapse(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["url"])
    out = {
        r.canonical_url: (r.n_urls, r.n_rows)
        for r in canonical_url_dups(df).collect()
    }
    n_base = sum(1 for _, c in CASES if c == BASE)
    assert out[BASE] == (n_base, n_base)
    # both root forms collapse onto one canonical key
    assert out["https://domain001.example.com"] == (2, 2)
