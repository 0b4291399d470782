"""Round-4 batch c planted truth: Gorilla-XOR encoded sizes for
hand-crafted series hit the closed form the oracle uses (8 header +
1 ctrl/point + significant bytes of each XOR-with-predecessor word)."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import numpy as np


def _sig(w: int) -> int:
    if w == 0:
        return 0
    b = [(w >> (8 * i)) & 255 for i in range(8)]
    nz = [i for i, x in enumerate(b) if x]
    return nz[-1] - nz[0] + 1


def _closed_form(vals: np.ndarray) -> int:
    bits = vals.astype(np.float64).view(np.uint64)
    xored = bits.copy()
    xored[1:] = bits[1:] ^ bits[:-1]
    return 8 + len(vals) + sum(_sig(int(w)) for w in xored)


def test_encode_floats_sizes_match_closed_form():
    from mintpy_spark.codecs.gorilla import encode_floats

    # constant series: first word = full pattern, rest XOR to zero ->
    # 8 + n ctrl + sig(pattern) payload
    # bits(1.5) = 0x3FF8000000000000: two significant bytes (6..7)
    v = np.full(6, 1.5, dtype=np.float64)
    assert len(encode_floats(v)) == _closed_form(v) == 8 + 6 + 2
    # small-integer steps share exponents -> short XOR words
    v2 = np.array([100.0, 101.0, 102.0, 250.0], dtype=np.float64)
    assert len(encode_floats(v2)) == _closed_form(v2)
    # exponent changes flip high mantissa/exponent bytes
    v3 = np.array([1.0, 4096.0, -0.5, 1e300, 0.0], dtype=np.float64)
    assert len(encode_floats(v3)) == _closed_form(v3)
    # all-zero series: one full-zero word chain = header + ctrl + first
    z = np.zeros(4, dtype=np.float64)
    assert len(encode_floats(z)) == 8 + 4 + 0


def test_codec_gorilla_size_audit_query(spark):
    from mintpy_spark.queries_tiers import codec_gorilla_size_audit

    t0 = dt.datetime(2024, 7, 1)
    rows = []
    # user 1: constant 1.23 -> cents 123, size = 8 + 4 + sig(bits(123.0))
    for h in range(4):
        rows.append((1, t0 + dt.timedelta(hours=h), h, "view", 1.23, None))
    # user 2: varying values exercise real XOR tails
    for h, val in enumerate([1.00, 2.50, 2.51, 400.00]):
        rows.append((2, t0 + dt.timedelta(hours=h), h, "view", val, None))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string,"
        " value double, props string"
    )
    exp1 = _closed_form(np.floor(np.array([1.23] * 4) * 100))
    exp2 = _closed_form(np.floor(np.array([1.00, 2.50, 2.51, 400.00]) * 100))
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        got = {
            r.user_id: r.asDict()
            for r in codec_gorilla_size_audit(spark, d).collect()
        }
    assert got[1]["f_bytes"] == exp1 and got[1]["n"] == 4
    assert got[2]["f_bytes"] == exp2 and got[2]["n"] == 4
    assert all(r["f_exact"] for r in got.values())
    assert got[1]["f_ratio_bp"] == (10000 * exp1) // 32
