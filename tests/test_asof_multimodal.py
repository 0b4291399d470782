"""As-of join semantics + multimodal plumbing tests."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mintpy_spark.operators.asof import asof_join
from mintpy_spark.operators.multimodal import (
    decode_media,
    extract_features,
    sniff_media_type,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    right = spark.createDataFrame(
        [
            ("k1", _ts("2023-01-01 00:00:00"), 1.0),
            ("k1", _ts("2023-01-03 00:00:00"), 3.0),
            ("k1", _ts("2023-01-05 00:00:00"), 5.0),
            ("k2", _ts("2023-01-04 00:00:00"), 40.0),
        ],
        "k string, ts timestamp, v double",
    )
    left = spark.createDataFrame(
        [
            ("k1", _ts("2023-01-02 12:00:00")),  # -> 1.0
            ("k1", _ts("2023-01-03 00:00:00")),  # tie -> 3.0 (<= semantics)
            ("k1", _ts("2023-01-09 00:00:00")),  # -> 5.0
            ("k2", _ts("2023-01-01 00:00:00")),  # no prior -> NULL
            ("k3", _ts("2023-01-01 00:00:00")),  # key absent -> NULL
        ],
        "k string, ts timestamp",
    )
    out = {(r.k, r.ts): (r.v, r.asof_ts)
           for r in asof_join(left, right, key="k", ts="ts").collect()}
    assert out[("k1", _ts("2023-01-02 12:00:00"))][0] == 1.0
    assert out[("k1", _ts("2023-01-03 00:00:00"))][0] == 3.0
    assert out[("k1", _ts("2023-01-09 00:00:00"))] == (5.0, _ts("2023-01-05 00:00:00"))
    assert out[("k2", _ts("2023-01-01 00:00:00"))][0] is None
    assert out[("k3", _ts("2023-01-01 00:00:00"))][0] is None
    assert len(out) == 5  # probe count preserved


def test_sniff_media_type():
    assert sniff_media_type(b"\x89PNG\r\n\x1a\nxxxx") == "image/png"
    assert sniff_media_type(b"GIF89a...") == "image/gif"
    assert sniff_media_type(b"\x00\x00\x00\x18ftypisom") == "video/mp4"
    assert sniff_media_type(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "image/webp"
    assert sniff_media_type(b"%PDF-1.7") == "application/pdf"
    assert sniff_media_type(b"ID3\x04") == "audio/mpeg"
    assert sniff_media_type(b"\xff\xd8\xff\xe0") == "image/jpeg"
    assert sniff_media_type(b"RIFF....WAVE") == "audio/wav"
    assert sniff_media_type(b"whatever") == "application/octet-stream"


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, b"\x89PNG\r\n\x1a\n" + b"\x00" * 32),
        (2, b"\xff\xd8\xff" + b"\x01" * 32),
        (3, b"RIFF" + b"\x02" * 32),
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_decode_media_stub_schema_and_determinism(media_df, spark):
    out = decode_media(media_df)
    assert out.columns == [
        "media_id", "media_type", "width", "height", "n_frames",
        "sample_rate", "duration_ms",
    ]
    rows1 = sorted(out.collect())
    rows2 = sorted(decode_media(media_df).collect())
    assert rows1 == rows2  # deterministic stub
    by_id = {r.media_id: r for r in rows1}
    assert by_id[1].media_type == "image/png"
    assert by_id[2].media_type == "image/jpeg"
    assert by_id[3].media_type == "audio/wav"
    assert all(r.width >= 16 and r.height >= 16 for r in rows1)


def test_decode_media_real_path_raises(media_df):
    import py4j.protocol
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, py4j.protocol.Py4JJavaError)):
        decode_media(media_df, decode_stub=False).collect()


def test_extract_features_unit_norm(media_df):
    out = extract_features(media_df, dim=16).collect()
    assert len(out) == 3
    for r in out:
        assert len(r.features) == 16
        norm = sum(x * x for x in r.features) ** 0.5
        assert abs(norm - 1.0) < 1e-5


def test_riff_family_split():
    assert sniff_media_type(b"RIFF\x00\x00\x00\x00WAVEfmt ") == "audio/wav"
    assert sniff_media_type(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "image/webp"
    assert sniff_media_type(b"RIFF\x24\x00\x00\x00AVI LIST") == "video/avi"
