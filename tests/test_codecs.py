"""Codec round-trip properties (bit-exact floats, exact timestamps,
byte-identical text through the block path)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mintpy_spark.codecs.gorilla import (
    decode_floats,
    decode_timestamps,
    encode_floats,
    encode_timestamps,
)


@given(
    st.lists(
        st.floats(width=32, allow_nan=True, allow_infinity=True), max_size=300
    )
)
@settings(max_examples=200, deadline=None)
def test_float32_roundtrip_bitexact(vals):
    arr = np.array(vals, dtype=np.float32)
    out = decode_floats(encode_floats(arr))
    assert out.dtype == np.float32
    assert np.array_equal(arr.view(np.uint32), out.view(np.uint32))


@given(st.lists(st.floats(allow_nan=True, allow_infinity=True), max_size=200))
@settings(max_examples=100, deadline=None)
def test_float64_roundtrip_bitexact(vals):
    arr = np.array(vals, dtype=np.float64)
    out = decode_floats(encode_floats(arr))
    assert np.array_equal(arr.view(np.uint64), out.view(np.uint64))


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**52), min_size=0, max_size=300
    )
)
@settings(max_examples=200, deadline=None)
def test_timestamp_roundtrip_exact(vals):
    arr = np.array(sorted(vals), dtype=np.int64)
    out = decode_timestamps(encode_timestamps(arr))
    assert np.array_equal(arr, out)


def test_regular_grid_compresses_hard():
    ts = np.arange(0, 10**10, 3600 * 10**6, dtype=np.int64)  # hourly grid
    blob = encode_timestamps(ts)
    assert len(blob) < ts.size * 1.5 + 32  # ~1 byte/point + header
    vals = np.full(1000, np.float32(3.14159))
    fblob = encode_floats(vals)
    assert len(fblob) < 1100 + 16  # 1 ctrl byte/point after first


def test_compression_ratio_on_slow_series():
    rng = np.random.default_rng(0)
    vals = (1000 + np.cumsum(rng.normal(0, 0.5, 5000))).astype(np.float32)
    ratio = (vals.size * 4) / len(encode_floats(vals))
    assert ratio > 1.2  # beats raw float32


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_empty_and_single(dtype):
    for n in (0, 1, 2):
        arr = np.arange(n, dtype=dtype)
        assert np.array_equal(decode_floats(encode_floats(arr)), arr)
        ts = np.arange(n, dtype=np.int64)
        assert np.array_equal(decode_timestamps(encode_timestamps(ts)), ts)


def test_block_pack_unpack_byte_identical_text(spark, pages):
    """The input_hint invariant: text survives the full compress/store/
    decompress path byte-identically per (url, warc_ts)."""
    from pyspark.sql import functions as F

    from mintpy_spark.codecs.blocks import pack_blocks, unpack_blocks

    obs = pages.select(
        "url", "warc_ts", F.octet_length("text").alias("text_length"),
        F.encode("text", "UTF-8").alias("text_bytes"),
    )
    blocks = pack_blocks(obs, "text_length", text_col="text_bytes")
    back = unpack_blocks(blocks, with_text=True)
    orig = obs.select(
        "url", "warc_ts",
        F.sha1("text_bytes").alias("sha_orig"),
        F.col("text_length").cast("double").alias("v_orig"),
    )
    got = back.select(
        F.col("key").alias("url"), "warc_ts",
        F.sha1("text").alias("sha_got"), F.col("value").alias("v_got"),
    )
    j = orig.join(got, ["url", "warc_ts"], "full")
    assert j.where(
        F.col("sha_orig").isNull()
        | F.col("sha_got").isNull()
        | (F.col("sha_orig") != F.col("sha_got"))
        | (F.col("v_orig") != F.col("v_got"))
    ).count() == 0
    # block table is much smaller than the obs table
    assert blocks.count() < obs.count() / 3


def test_retention_split_and_restore_lossless(spark, obs):
    """apply_retention splits hot/cold; restore() reproduces the original
    series exactly (float64 block dtype -> bit-identical values)."""
    from pyspark.sql import functions as F

    from mintpy_spark.operators.retention import apply_retention, restore

    src = obs.select(
        F.col("url").cast("string").alias("url"),
        "warc_ts",
        F.col("text_length").cast("double").alias("text_length"),
    )
    split = apply_retention(src, "text_length", raw_days=60)
    n_raw = split["raw"].count()
    n_cold_pts = split["cold"].agg(F.sum("n")).first()[0]
    assert n_raw > 0 and n_cold_pts > 0
    assert n_raw + n_cold_pts == src.count()
    # cold tier genuinely compresses vs the long rows it encodes
    back = restore(split, "text_length")
    assert back.count() == src.count()
    a = {tuple(r) for r in src.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_retention_null_rows_stay_raw(spark):
    """NULL ts / NULL value rows must surface in the raw tier, not vanish
    (the cold codec can represent neither)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from mintpy_spark.operators.retention import apply_retention, restore

    pdf = pd.DataFrame(
        {
            "url": ["a", "a", "a", "a"],
            "warc_ts": [
                pd.Timestamp("2023-01-01"),
                pd.Timestamp("2023-06-01"),
                pd.NaT,
                pd.Timestamp("2023-01-02"),
            ],
            "text_length": [1.0, 2.0, 3.0, None],
        }
    )
    df = spark.createDataFrame(pdf)
    split = apply_retention(df, "text_length", horizon="2023-05-01")
    raw_rows = split["raw"].collect()
    assert len(raw_rows) == 3  # recent + null-ts + null-value
    assert split["cold"].agg(F.sum("n")).first()[0] == 1
    assert restore(split, "text_length").count() == 4


def test_block_timestamps_roundtrip_exact_microseconds(spark):
    """Adversarial microsecond components (incl. values near the double
    truncation boundary) must round-trip bit-exactly."""
    import pandas as pd

    from mintpy_spark.codecs.blocks import pack_blocks, unpack_blocks

    ts = [
        pd.Timestamp("2023-01-01 00:00:00.000001"),
        pd.Timestamp("2023-01-01 00:00:00.999999"),
        pd.Timestamp("2026-02-28 23:59:59.777777"),
        pd.Timestamp("2033-05-18 03:33:20.000001"),  # epoch 2e9 + 1us
    ]
    pdf = pd.DataFrame({"url": "u", "warc_ts": ts, "v": [1.0, 2.0, 3.0, 4.0]})
    blocks = pack_blocks(spark.createDataFrame(pdf), "v", value_dtype="float64")
    back = unpack_blocks(blocks).orderBy("warc_ts").collect()
    assert [r.warc_ts for r in back] == sorted(ts)
