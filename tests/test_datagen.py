"""Datagen determinism + shape — mirrors the reference's seeded simulation
fixtures (tests/dem_error.py:56-67 fixed np.random.seed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mintpy_spark.datagen import gen_pages


def fingerprint(df, cols):
    return df.agg(
        F.expr(f"bit_xor(xxhash64({', '.join(cols)}))").alias("h"),
        F.count("*").alias("n"),
    ).collect()[0]


def test_deterministic_across_partitionings(spark):
    a = gen_pages(spark, num_urls=30, partitions=2)
    b = gen_pages(spark, num_urls=30, partitions=16)
    cols = ["url", "warc_ts", "html", "text", "lang"]
    fa, fb = fingerprint(a, cols), fingerprint(b, cols)
    assert (fa.h, fa.n) == (fb.h, fb.n)


def test_schema_and_shape(pages):
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    counts = pages.groupBy("url").count().agg(F.min("count"), F.max("count")).collect()[0]
    assert counts[0] >= 1 and counts[1] <= 80


def test_html_contains_non_utf8(pages):
    row = pages.select("html").first()
    assert b"\xff\xfe" in row.html  # byte-identity coverage bytes present


def test_zipf_domain_skew(pages):
    dom = pages.select(F.regexp_extract("url", r"https://([^/]+)/", 1).alias("d"))
    top = dom.groupBy("d").count().orderBy(F.desc("count")).first()
    total = pages.count()
    assert top["count"] / total > 0.10  # heaviest domain is a hot key
