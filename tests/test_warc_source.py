"""WARC source reader (sources/warc.py): byte-exact bodies through both
layouts (plain + per-record gzip members), mixed record types, and the
distributed binaryFile -> mapInPandas path."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from mintpy_spark.sources.warc import encode_warc, parse_warc, read_warc

RECS = [
    ("https://a.example/x", dt.datetime(2024, 3, 1, 12, 0, 5), b"<html>alpha</html>"),
    ("https://b.example/y?q=1", dt.datetime(2024, 3, 2, 8, 30, 0), b"\x00binary\xffbody"),
    ("https://c.example/", dt.datetime(2024, 3, 3, 0, 0, 0), "unicode éß".encode()),
]


def test_parse_plain_and_gzip_members_byte_exact():
    for gz in (False, True):
        rows = parse_warc(encode_warc(RECS, gzip_members=gz))
        assert [r["url"] for r in rows] == [u for u, _, _ in RECS]
        assert [r["html"] for r in rows] == [b for _, _, b in RECS]
        assert [r["warc_ts"] for r in rows] == [t for _, t, _ in RECS]
        assert all(r["record_type"] == "response" for r in rows)
        assert all(r["http_status"] == 200 for r in rows)


def test_parse_skips_non_response_records():
    """warcinfo records (no HTTP payload) surface with html=None; the
    response records around them still parse byte-exactly."""
    info = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 18\r\n\r\n"
        b"software: test/1.0\r\n\r\n"
    )
    blob = info + encode_warc(RECS[:1])
    rows = parse_warc(blob)
    assert [r["record_type"] for r in rows] == ["warcinfo", "response"]
    assert rows[0]["html"] is None and rows[0]["url"] is None
    assert rows[1]["html"] == RECS[0][2]


def test_read_warc_distributed(spark):
    """Two files (one plain, one .warc.gz) through the binaryFile +
    mapInPandas path: every body byte-exact, src_file populated, and the
    response filter isolates page rows."""
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "part1.warc"), "wb") as f:
            f.write(encode_warc(RECS[:2]))
        with open(os.path.join(d, "part2.warc.gz"), "wb") as f:
            f.write(encode_warc(RECS[2:], gzip_members=True))
        df = read_warc(spark, d)
        rows = df.where("record_type = 'response'").collect()
    got = {r.url: (bytes(r.html), r.warc_ts, r.http_status) for r in rows}
    assert set(got) == {u for u, _, _ in RECS}
    for u, t, b in RECS:
        assert got[u] == (b, t, 200)
    assert all(r.src_file for r in rows)


def test_gzip_member_split_is_real():
    """The .warc.gz layout must be one gzip MEMBER per record (Common
    Crawl's contract for range-based record access), not one stream."""
    import zlib

    blob = encode_warc(RECS, gzip_members=True)
    members = 0
    data = blob
    while data:
        assert data[:2] == b"\x1f\x8b"
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        member = d.decompress(data)
        assert member.startswith(b"WARC/1.0\r\n")  # one record per member
        assert d.eof
        data = d.unused_data
        members += 1
        assert members <= len(RECS)
    assert members == len(RECS)
