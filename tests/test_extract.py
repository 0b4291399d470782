"""Byte-identity invariant: extract_text(html) == text for every row
(BASELINE.json input_hint), mirroring the reference's exact-dtype scan
contract (utils/readfile.py:319-388 returns stored values unaltered)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mintpy_spark.datagen import gen_pages
from mintpy_spark.operators.extract import extract_text, extract_text_bytes


def test_extract_bytes_roundtrip_unit():
    body = "héllo wörld — ünïcode ✓".encode()
    html = b"<html>\xff\xfe<head>junk\x80</head><body>" + body + b"</body>\x81</html>"
    assert extract_text_bytes(html) == body


def test_extract_bytes_marker_in_text():
    # text containing the literal close marker survives (first-open/last-close)
    body = b"a</body>b"
    html = b"<body>" + body + b"</body>"
    assert extract_text_bytes(html) == body


def test_extract_bytes_malformed():
    assert extract_text_bytes(b"no markers here") is None
    assert extract_text_bytes(b"</body><body>") is None
    assert extract_text_bytes(None) is None


def test_extract_matches_text_column_exactly(spark):
    pages = gen_pages(spark, num_urls=60)
    got = extract_text(pages)
    # byte-identical: compare sha1 of UTF-8 bytes on both columns, JVM-side
    mism = got.where(
        F.sha1(F.encode("extracted_text", "UTF-8")) != F.sha1(F.encode("text", "UTF-8"))
    ).count()
    total = got.count()
    nulls = got.where(F.col("extracted_text").isNull()).count()
    assert total > 0 and mism == 0 and nulls == 0


def test_extract_drops_html_column(spark):
    pages = gen_pages(spark, num_urls=5)
    got = extract_text(pages)
    assert "html" not in got.columns and "extracted_text" in got.columns
