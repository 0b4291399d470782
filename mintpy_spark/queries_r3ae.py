"""Round-3 batch ae: URL canonicalization over planted noisy variants.

The north-rule corpus keys everything on ``url``; raw crawl URLs are
noisy (fragments, tracking params, case, default ports, duplicate and
trailing slashes), and canonicalizing before the per-url groupBy is the
difference between one tier series per page and five. The engine side
is ``operators/urltools.py`` — pure whole-stage-codegen string surgery.

Oracle strategy: planted truth, not regex duplication. Both engines
construct IDENTICAL raw URLs deterministically from ``doc_id`` (nine
variant shapes per logical page, ``page_id = doc_id // 9``); only Spark
runs the canonicalizer, while the oracle computes the expected canonical
directly from ``page_id``. A canonicalizer bug of any kind (missed
param, kept fragment, case leak, slash mishandling) breaks the
group-by-canonical counts and fails the hash compare — a stronger check
than mirroring the same regexes in DuckDB.

Variant table (m = doc_id % 9; canonical = base except m=8):

  0  base                                   5  base with :443 port
  1  base#section2                          6  double slash in path
  2  base?utm_source=..&utm_campaign=..     7  base?ref=tw#top
  3  base/                                  8  base?q=1&utm_medium=..
  4  UPPERCASE scheme+host                     (canonical = base?q=1)

Reference analog: MintPy standardizes dataset keys/file paths on ingest
(utils/readfile.py get_slice_list, attribute standardization) so
downstream operators agree on the key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.operators.urltools import (
    canonical_url_dups,
    canonicalize_url,
    url_host,
    url_path_depth,
    url_registered_domain,
)
from mintpy_spark.queries import _q, load

# DuckDB fragments constructing the same base / raw URL the Spark side
# builds with format_string — shared so both queries agree.
_B_SQL = (
    "'https://domain' || lpad(CAST(page_id % 40 AS VARCHAR), 3, '0')"
    " || '.example.com/page/' || CAST(page_id AS VARCHAR)"
)
_UP_SQL = (
    "'HTTPS://DOMAIN' || lpad(CAST(page_id % 40 AS VARCHAR), 3, '0')"
    " || '.EXAMPLE.COM/page/' || CAST(page_id AS VARCHAR)"
)
_RAW_SQL = f"""
      CASE m
        WHEN 0 THEN base
        WHEN 1 THEN base || '#section2'
        WHEN 2 THEN base || '?utm_source=feed&utm_campaign=x'
        WHEN 3 THEN base || '/'
        WHEN 4 THEN {_UP_SQL}
        WHEN 5 THEN replace(base, '.example.com/', '.example.com:443/')
        WHEN 6 THEN replace(base, '/page/', '/page//')
        WHEN 7 THEN base || '?ref=tw#top'
        ELSE base || '?q=1&utm_medium=email'
      END
"""


def _planted_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(page_id, m, raw_url): nine deterministic noisy variants per
    logical page, built row-locally from doc_id — the Spark twin of the
    oracle's CASE table above."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    page_id = F.expr("doc_id div 9").alias("page_id")
    m = (F.col("doc_id") % 9).alias("m")
    v = docs.select(page_id, m)
    base = F.format_string(
        "https://domain%03d.example.com/page/%d",
        F.col("page_id") % 40,
        F.col("page_id"),
    )
    up = F.format_string(
        "HTTPS://DOMAIN%03d.EXAMPLE.COM/page/%d",
        F.col("page_id") % 40,
        F.col("page_id"),
    )
    raw: Column = (
        F.when(F.col("m") == 0, base)
        .when(F.col("m") == 1, F.concat(base, F.lit("#section2")))
        .when(F.col("m") == 2, F.concat(base, F.lit("?utm_source=feed&utm_campaign=x")))
        .when(F.col("m") == 3, F.concat(base, F.lit("/")))
        .when(F.col("m") == 4, up)
        .when(
            F.col("m") == 5,
            F.regexp_replace(base, r"\.example\.com/", ".example.com:443/"),
        )
        .when(F.col("m") == 6, F.regexp_replace(base, r"/page/", "/page//"))
        .when(F.col("m") == 7, F.concat(base, F.lit("?ref=tw#top")))
        .otherwise(F.concat(base, F.lit("?q=1&utm_medium=email")))
    )
    return v.select("page_id", "m", raw.alias("raw_url"))


@_q(
    "url_canonical_dups",
    f"""
    WITH v AS (
      SELECT doc_id // 9 AS page_id, doc_id % 9 AS m FROM documents
    ), b AS (
      SELECT page_id, m, {_B_SQL} AS base FROM v
    ), c AS (
      SELECT CASE WHEN m = 8 THEN base || '?q=1' ELSE base END
               AS canonical_url,
             {_RAW_SQL} AS raw_url
      FROM b
    )
    SELECT canonical_url,
           CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_urls,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM c GROUP BY 1
    """,
)
def url_canonical_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup census over canonical URLs: nine planted noisy
    variants per page must collapse to ONE canonical key (two for the
    surviving-param shape m=8). The string surgery is row-local in the
    scan stage; the single Exchange is the group-by on the canonical
    key — the same shuffle the re-keyed corpus needs anyway. The oracle
    computes the expected canonical from page_id directly, so any
    canonicalizer defect splits a group and fails the compare."""
    raw = _planted_urls(spark, sf_dir)
    return canonical_url_dups(raw, url_col="raw_url").select(
        "canonical_url",
        F.col("n_urls").cast("long").alias("n_urls"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )


@_q(
    "url_host_census",
    f"""
    WITH v AS (
      SELECT doc_id // 9 AS page_id, doc_id % 9 AS m FROM documents
    )
    SELECT 'domain' || lpad(CAST(page_id % 40 AS VARCHAR), 3, '0')
             || '.example.com' AS host,
           MAX('example.com') AS reg_domain,
           CAST(COUNT(DISTINCT page_id * 2
                      + CASE WHEN m = 8 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pages,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(2) AS INTEGER) AS min_depth,
           CAST(MAX(2) AS INTEGER) AS max_depth
    FROM v GROUP BY 1
    """,
)
def url_host_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host census over the noisy variants: host extraction must
    lowercase and drop ports (m=4/m=5 would otherwise fork hosts),
    n_pages counts distinct canonicals per host, and min/max path depth
    pin the empty-segment filter (trailing slash m=3 and doubled slash
    m=6 would read depth 3 without it — ground truth is 2 for every
    variant). One shuffle on host, ~40 groups; everything else is
    scan-stage codegen."""
    raw = _planted_urls(spark, sf_dir)
    e = raw.select(
        url_host(F.col("raw_url")).alias("host"),
        url_registered_domain(F.col("raw_url")).alias("rd"),
        canonicalize_url(F.col("raw_url")).alias("canon"),
        url_path_depth(F.col("raw_url")).alias("depth"),
    )
    return e.groupBy("host").agg(
        F.max("rd").alias("reg_domain"),
        F.countDistinct("canon").cast("long").alias("n_pages"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("depth").cast("int").alias("min_depth"),
        F.max("depth").cast("int").alias("max_depth"),
    )
