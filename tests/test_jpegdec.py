"""Baseline JPEG pixel decoder (operators/jpegdec.py) — VERDICT r4 #8.

Three-tier exactness battery, matching what the standard itself
guarantees:
1. EXACT coefficient recovery through the entropy pipeline (Huffman +
   DC prediction + zigzag are bit-defined by ITU T.81).
2. EXACT pixels on analytically-determined inputs (flat/DC-only blocks,
   where the IDCT is a closed form).
3. T.83-style tolerance vs an INDEPENDENT decoder (javax.imageio inside
   the Spark JVM, libjpeg lineage): grayscale byte-exact on this JDK,
   color within max |diff| <= 3 (IDCT + upsample rounding freedom the
   spec allows).
"""

from __future__ import annotations

import numpy as np
import pytest

from mintpy_spark.operators.jpegdec import (
    ZIGZAG,
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


def _gradient_rgb(h=48, w=64):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack(
        [(x * 2 + 20) % 200 + 28, (y * 3 + 10) % 200 + 28, (x + y) % 200 + 28],
        axis=-1,
    ).astype(np.uint8)


def test_coefficient_roundtrip_exact_gray():
    """Entropy encode -> entropy decode recovers the quantized
    coefficients EXACTLY (the stage T.81 defines bit-exactly)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    for qs in (1, 4):
        jp = encode_jpeg(img, quality_scale=qs)
        qz = np.maximum(_STD_LUM_Q_NAT // qs, 1)[ZIGZAG]
        want = quantize_blocks(img.astype(np.float64) - 128.0, qz)
        got = decode_jpeg(jp, coefficients=True)[0]
        assert got.shape == want.shape
        assert (got == want).all()


def test_coefficient_roundtrip_exact_color_420():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    jp = encode_jpeg(img, "420", quality_scale=2)
    coefs = decode_jpeg(jp, coefficients=True)
    assert len(coefs) == 3
    assert coefs[0].shape[:2] == (4, 4)  # 32/8 luma blocks
    assert coefs[1].shape[:2] == (2, 2)  # subsampled chroma


def test_flat_image_analytic_exact():
    """A flat gray image is DC-only: decoded value has the closed form
    clip(round(dcq * q0 / 8 + 128)) — exact, no tolerance."""
    q0 = int(_STD_LUM_Q_NAT[0])  # 16, zigzag[0] == natural[0]
    for v in (0, 7, 77, 128, 200, 255):
        img = np.full((16, 16), v, np.uint8)
        jp = encode_jpeg(img)
        out = decode_jpeg(jp)
        # the quantized DC comes from the shared float-DCT path (its
        # rounding at exact .5 boundaries is the encoder's choice, not
        # spec-defined); the IDCT of a DC-only block IS closed-form
        qz = np.maximum(_STD_LUM_Q_NAT // 1, 1)[ZIGZAG]
        dcq = int(quantize_blocks(np.full((8, 8), float(v)) - 128.0, qz)[0, 0, 0])
        want = int(np.clip(round(dcq * q0 / 8.0 + 128.0), 0, 255))
        assert (out == want).all(), (v, want, out[0, 0])


def test_restart_markers_do_not_change_pixels():
    img = _gradient_rgb()
    a = decode_jpeg(encode_jpeg(img, "420", quality_scale=2))
    b = decode_jpeg(
        encode_jpeg(img, "420", quality_scale=2, restart_interval=3)
    )
    assert (a == b).all()


def test_progressive_raises_to_seam():
    # minimal SOF2 after SOI: must raise ValueError (PIL seam), not
    # mis-decode
    bad = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
    with pytest.raises(ValueError, match="progressive|non-baseline"):
        decode_jpeg(bad + b"\xff\xd9")


def _jvm_rgb(spark, payload: bytes) -> np.ndarray:
    jvm = spark._jvm
    bais = jvm.java.io.ByteArrayInputStream(bytearray(payload))
    img = jvm.javax.imageio.ImageIO.read(bais)
    w, h = img.getWidth(), img.getHeight()
    arr = img.getRGB(0, 0, w, h, None, 0, w)
    a = np.array(arr, dtype=np.int64).reshape(h, w)
    return np.stack(
        [(a >> 16) & 255, (a >> 8) & 255, a & 255], axis=-1
    ).astype(np.uint8)


def _jvm_gray(spark, payload: bytes) -> np.ndarray:
    jvm = spark._jvm
    bais = jvm.java.io.ByteArrayInputStream(bytearray(payload))
    img = jvm.javax.imageio.ImageIO.read(bais)
    data = img.getRaster().getDataBuffer().getData()
    return np.frombuffer(bytes(data), np.uint8).reshape(
        img.getHeight(), img.getWidth()
    )


def test_gray_byte_exact_vs_independent_decoder(spark):
    """Grayscale vs javax.imageio: byte-exact on smooth content; +-1 on
    texture (the IDCT is tolerance-bounded, not bit-standardized — both
    decoders are conformant)."""
    ramp = (np.linspace(10, 245, 64)[None, :] * np.ones((48, 1))).astype(
        np.uint8
    )
    for qs in (4, 1):
        jp = encode_jpeg(ramp, quality_scale=qs)
        mine = decode_jpeg(jp)
        ref = _jvm_gray(spark, jp)
        assert (mine == ref).all()
    # textured content exercises the IDCT's spec-allowed +-1 freedom
    rng = np.random.default_rng(13)
    tex = rng.integers(40, 216, (32, 32)).astype(np.uint8)
    jp = encode_jpeg(tex, quality_scale=2)
    d = np.abs(decode_jpeg(jp).astype(int) - _jvm_gray(spark, jp).astype(int))
    assert d.max() <= 1


def test_color_tolerance_vs_independent_decoder(spark):
    """Color: T.83-style tolerance vs javax.imageio — max |diff| <= 3,
    mean <= 0.5 (IDCT variant + chroma upsample rounding freedom)."""
    img = _gradient_rgb()
    rng = np.random.default_rng(14)
    tex = rng.integers(60, 196, (48, 64, 3)).astype(np.uint8)
    for im in (img, tex):
        for sub in ("444", "420"):
            jp = encode_jpeg(im, sub, quality_scale=2)
            mine = decode_jpeg(jp)
            ref = _jvm_rgb(spark, jp)
            d = np.abs(mine.astype(int) - ref.astype(int))
            assert d.max() <= 3, (sub, d.max())
            assert d.mean() <= 0.5, (sub, d.mean())


def test_multimodal_features_decode_jpeg_payloads(spark):
    """media_features' real path now histograms actual JPEG pixels."""
    from mintpy_spark.operators.multimodal import extract_features

    img = _gradient_rgb(32, 32)
    jp = encode_jpeg(img, "420", quality_scale=2)
    df = spark.createDataFrame([("a", bytearray(jp))], "id string, payload binary")
    out = extract_features(df, "payload", dim=8, decode_stub=False).collect()
    v = np.array(out[0]["features"])
    assert v.shape == (8,)
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5
    # histogram of actual luminance, not a hash: recompute expectation
    mine = decode_jpeg(jp)
    lum = mine.astype(np.float32).mean(axis=2).ravel()
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 256.0))
    want = hist.astype(np.float32)
    want = want / np.linalg.norm(want)
    assert np.allclose(v, want, atol=1e-6)


def test_single_component_scan_ignores_sof_sampling_factors():
    """T.81 A.2.3: a single-component scan is non-interleaved raster
    order regardless of SOF h/v — a grayscale frame declaring h=v=2
    (libjpeg emits these) must decode identically to h=v=1."""
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    jp = encode_jpeg(img, quality_scale=2)
    i = jp.find(b"\xff\xc0")
    assert jp[i + 11] == 0x11
    patched = jp[: i + 11] + b"\x22" + jp[i + 12 :]
    assert (decode_jpeg(patched) == decode_jpeg(jp)).all()


def test_truncated_entropy_stream_raises_valueerror():
    rng = np.random.default_rng(22)
    img = rng.integers(0, 256, (32, 32)).astype(np.uint8)  # dense entropy
    jp = encode_jpeg(img, quality_scale=8)
    sos = jp.find(b"\xff\xda")
    truncated = jp[: sos + 12]  # 2 bytes into the entropy data
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(truncated)
