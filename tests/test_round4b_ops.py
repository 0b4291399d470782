"""Round-4 batch b planted truth: delta-of-delta encoded sizes for
hand-crafted series hit the closed form the oracle uses."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import numpy as np


def test_encode_timestamps_sizes_match_closed_form():
    from mintpy_spark.codecs.gorilla import encode_timestamps

    us = 1_000_000
    # perfectly regular grid, n=5: 8 header + 16 first-two + 3 class
    # bytes (all class 0) + 0 payload = 27
    t = np.arange(5, dtype=np.int64) * 3600 * us
    assert len(encode_timestamps(t)) == 27
    # n=2 stores raw: 8 + 16
    assert len(encode_timestamps(t[:2])) == 24
    # one +1s jitter at position 2 -> d1 = [3600, 3601, 3599, 3600] s,
    # d2 = [+1s, -2s, +1s]: three 4-byte classes = 24 + 3 + 12 = 39
    t2 = t.copy(); t2[2] += us
    assert len(encode_timestamps(t2)) == 39
    # byte-boundary classes: d2 of 127/-128 -> 1 byte; 128 -> 2 bytes
    base = np.array([0, 1000], dtype=np.int64)
    for d2, nbytes in ((0, 0), (127, 1), (-128, 1), (128, 2), (-129, 2),
                       (32767, 2), (32768, 4), (-2147483648, 4),
                       (2147483648, 8)):
        t3 = np.array([0, 1000, 2000 + d2], dtype=np.int64)
        assert len(encode_timestamps(t3)) == 24 + 1 + nbytes, d2


def test_codec_dod_size_audit_query(spark):
    from mintpy_spark.queries_tiers import codec_dod_size_audit

    t0 = dt.datetime(2024, 7, 1)
    rows = []
    # user 1: regular hourly grid (n=4) -> 24 + 2 + 0 = 26
    for h in range(4):
        rows.append((1, t0 + dt.timedelta(hours=h), h, "view", 1.5, None))
    # user 2: two points -> raw 24
    rows += [(2, t0, 10, "view", 2.5, None), (2, t0 + dt.timedelta(hours=1), 11, "view", 3.5, None)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string,"
        " value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        got = {r.user_id: r.asDict() for r in codec_dod_size_audit(spark, d).collect()}
    assert got[1]["ts_bytes"] == 26 and got[1]["n"] == 4
    assert got[2]["ts_bytes"] == 24 and got[2]["n"] == 2
    assert all(r["ts_exact"] and r["f_exact"] for r in got.values())
    # ratio: user1 = round(10000*26/32) = 8125 bp
    assert got[1]["ts_ratio_bp"] == 8125


def test_codec_text_blob_roundtrip_query_with_null_text(spark):
    """NULL text must ledger as NULL through the blob (never fabricate
    b'None'), and md5s must match the source bytes for the rest."""
    import pyspark.sql.functions as F

    from mintpy_spark.queries_tiers import codec_text_blob_roundtrip

    rows = [
        (0, "hello world", "en", "web", 11),
        (1, None, "en", "web", 0),
        (2, "καλημέρα", "el", "news", 8),  # multibyte utf-8
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        got = {r.doc_id: r.asDict() for r in codec_text_blob_roundtrip(spark, d).collect()}
        want = {
            r.doc_id: r.m
            for r in df.select("doc_id", F.md5("text").alias("m")).collect()
        }
    assert set(got) == {0, 1, 2}
    assert got[1]["text_md5"] is None
    for i in (0, 2):
        assert got[i]["text_md5"] == want[i]
    assert got[2]["n_chars"] == 8


def test_decode_bmp_coreheader():
    """BITMAPCOREHEADER (OS/2 v1, 12-byte DIB): uint16 dims, bottom-up
    BGR rows with 4-byte padding — byte-exact against the same pixel
    array encoded via the BITMAPINFOHEADER encoder."""
    from mintpy_spark.operators.multimodal import decode_bmp

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (3, 5, 3), dtype=np.uint8)
    h, w = img.shape[:2]
    row = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, row), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    pix_off = 14 + 12
    payload = (
        b"BM" + (pix_off + body.size).to_bytes(4, "little")
        + b"\x00\x00\x00\x00" + pix_off.to_bytes(4, "little")
        + (12).to_bytes(4, "little")
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + body.tobytes()
    )
    assert np.array_equal(decode_bmp(payload), img)


def _png_chunk(tag, body):
    import zlib
    return (len(body).to_bytes(4, "big") + tag + body
            + (zlib.crc32(tag + body) & 0xFFFFFFFF).to_bytes(4, "big"))


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def test_decode_png_adam7_truecolor_and_paletted():
    """Adam7 de-interlacing: forward-build the seven filter-0 sub-images
    per the spec grid and require byte-exact reassembly — for 8-bit
    truecolor on a non-multiple-of-8 canvas (pass-skip + ragged passes)
    and for 4-bit paletted (sub-byte packing inside each pass)."""
    import zlib

    from mintpy_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(23)

    # truecolor 10x9
    img = rng.integers(0, 256, (9, 10, 3), dtype=np.uint8)
    h, w = img.shape[:2]
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw += b"\x00" + row.tobytes()
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 1])
    payload = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
               + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_png(payload), img)

    # 4-bit paletted 7x5
    palette = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (5, 7), dtype=np.uint8)
    h, w = idx.shape
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = idx[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            line = bytearray()
            for i in range(0, len(row), 2):
                hi = int(row[i]) << 4
                lo = int(row[i + 1]) if i + 1 < len(row) else 0
                line.append(hi | lo)
            raw += b"\x00" + bytes(line)
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([4, 3, 0, 0, 1])
    payload = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"PLTE", palette.tobytes())
               + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
               + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_png(payload), palette[idx])
