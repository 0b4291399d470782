"""Property tests for the baseline JPEG codec (pure Python/NumPy paths —
no Spark): the entropy pipeline is exact for ANY image, the marker walk
reports true dimensions, the upsampler preserves constants."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mintpy_spark.operators.jpegdec import (
    ZIGZAG,
    _upsample,
    decode_jpeg,
    encode_jpeg,
    quantize_blocks,
)

_STD_LUM_Q_NAT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    bw=st.integers(2, 6),
    bh=st.integers(2, 6),
    qs=st.sampled_from([1, 2, 4, 8]),
    rst=st.sampled_from([0, 1, 3]),
)
def test_entropy_pipeline_exact_any_gray_image(seed, bw, bh, qs, rst):
    """Huffman + DC prediction + zigzag recover quantized coefficients
    EXACTLY for arbitrary content, sizes, tables, restart intervals."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (bh * 16, bw * 16)).astype(np.uint8)
    jp = encode_jpeg(img, quality_scale=qs, restart_interval=rst)
    qz = np.maximum(_STD_LUM_Q_NAT // qs, 1)[ZIGZAG]
    want = quantize_blocks(img.astype(np.float64) - 128.0, qz)
    got = decode_jpeg(jp, coefficients=True)[0]
    assert (got == want).all()


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    bw=st.integers(1, 4),
    bh=st.integers(1, 4),
    sub=st.sampled_from(["444", "420"]),
)
def test_color_entropy_pipeline_exact(seed, bw, bh, sub):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (bh * 16, bw * 16, 3)).astype(np.uint8)
    jp = encode_jpeg(img, sub, quality_scale=2, restart_interval=2)
    coefs = decode_jpeg(jp, coefficients=True)
    assert len(coefs) == 3
    # luma block grid matches image; chroma matches the sampling factor
    assert coefs[0].shape[:2] == (bh * 2, bw * 2)
    f = 1 if sub == "420" else 2
    assert coefs[1].shape[:2] == (bh * f, bw * f)
    # decode end-to-end never crashes and has the right shape
    assert decode_jpeg(jp).shape == img.shape


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31), bw=st.integers(1, 5), bh=st.integers(1, 5))
def test_marker_walk_reports_true_dimensions(seed, bw, bh):
    from mintpy_spark.operators.multimodal import jpeg_dimensions

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (bh * 16, bw * 16)).astype(np.uint8)
    assert jpeg_dimensions(encode_jpeg(img)) == (bw * 16, bh * 16)


@settings(max_examples=20, deadline=None)
@given(
    v=st.integers(0, 255),
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    fx=st.sampled_from([1, 2]),
    fy=st.sampled_from([1, 2]),
)
def test_upsample_preserves_constants_and_dims(v, h, w, fx, fy):
    p = np.full((h, w), v, np.uint8)
    up = _upsample(p, fx, fy)
    assert up.shape == (h * fy, w * fx)
    assert (up == v).all()  # triangular filter of a constant is exact
