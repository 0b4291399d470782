"""URL canonicalization and host-level grouping for the web-page table.

A Common-Crawl-style corpus keys everything on ``url`` (north-rule input
shape ``(url, warc_ts, html, text, lang)``), and raw crawl URLs are
noisy: scheme/host case, default ports, fragments, tracking params,
trailing slashes, and duplicate slashes all fracture what is logically
one page into many keys. Canonicalizing BEFORE the per-url groupBy is
the difference between one tier series per page and five.

Everything here is pure Catalyst expression work — ``regexp_replace`` /
``parse_url``-free string surgery that stays inside whole-stage codegen
(no Python UDF in the hot path; at 10^12 rows this runs in the scan
stage's codegen span, free relative to the shuffle it precedes).

Reference analog: MintPy normalizes file paths and dataset names on
ingest (``utils/readfile.py`` get_slice_list / standardize metadata)
for the same reason — downstream operators must agree on the key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking parameters stripped by canonicalize_url (public convention:
# the utm_* family plus the common click-id params).
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "ref",
)


def _strip_fragment(u: Column) -> Column:
    return F.regexp_replace(u, r"#.*$", "")


def canonicalize_url(u: Column) -> Column:
    """One canonical string per logical page:

    1. strip the fragment (``#...``),
    2. lowercase scheme and host, drop default ports (:80/:443),
    3. drop tracking query params (TRACKING_PARAMS), then the whole
       ``?`` when no params survive,
    4. collapse duplicate path slashes, strip the trailing slash
       (the bare root also normalizes to the no-slash form, so
       ``https://h/`` and ``https://h`` agree).
    """
    u = _strip_fragment(u)

    def _with(df_col: Column) -> Column:
        # 2: lowercase the scheme://host[:port] prefix in place
        p = F.regexp_extract(df_col, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
        t = F.substring(df_col, F.length(p) + 1, F.lit(2_000_000_000))
        host = F.lower(p)
        host = F.regexp_replace(host, r":80$|:443$", "")
        s = F.concat(host, t)
        # 3: strip tracking params wherever they sit in the query string
        for param in TRACKING_PARAMS:
            s = F.regexp_replace(s, rf"([?&]){param}=[^&#]*", r"$1")
        s = F.regexp_replace(s, r"\?&+", "?")       # ?&x -> ?x
        s = F.regexp_replace(s, r"&&+", "&")        # a&&b -> a&b
        s = F.regexp_replace(s, r"[?&]$", "")       # dangling ? or &
        # 4: collapse duplicate slashes in the path (not the ``://``)
        s = F.regexp_replace(s, r"(?<!:)//+", "/")
        s = F.regexp_replace(s, r"(://[^/?#]+/[^?#]*?)/+(\?|$)", r"$1$2")
        s = F.regexp_replace(s, r"(://[^/?#]+[^/?#])/$", r"$1")
        return s

    return _with(u)


def url_host(u: Column) -> Column:
    """Lowercased host (no port) — the politeness / partitioning key a
    crawler schedules on."""
    return F.lower(
        F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)", 1)
    )


def url_registered_domain(u: Column) -> Column:
    """Last two host labels (example.com from a.b.example.com) — the
    public-suffix-list-free approximation that is exact for the
    single-suffix TLDs the synthetic corpus uses."""
    return F.regexp_extract(url_host(u), r"([^.]+\.[^.]+)$", 1)


def url_path_depth(u: Column) -> Column:
    """Number of non-empty path segments — a cheap page-type signal
    (depth 0 = site root, deep paths = articles/products)."""
    path = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1)
    segs = F.filter(F.split(path, "/"), lambda x: x != "")
    return F.size(segs)


def canonical_url_dups(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(canonical_url, n_urls, n_rows): groups of raw URLs that collapse
    to one canonical key — the exact-dedup census a crawl pipeline runs
    before re-keying. One shuffle on the canonical key; the heavy
    string surgery is row-local in the scan stage."""
    c = canonicalize_url(F.col(url_col)).alias("canonical_url")
    return (
        pages.select(c, F.col(url_col))
        .groupBy("canonical_url")
        .agg(
            F.countDistinct(url_col).alias("n_urls"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
