"""Round-5 review-fix tests (ADVICE r4): seqstate hot-key buffering +
NULL-key guard, heaps_curve empty-input guard, jpeg EOI termination."""

from __future__ import annotations

import pytest


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _sof(h: int, w: int) -> bytes:
    body = (
        b"\x08"
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + b"\x03"
        + b"\x00" * 9
    )
    return _seg(0xC0, body)


def test_jpeg_eoi_terminates_marker_walk():
    from mintpy_spark.operators.multimodal import jpeg_dimensions

    # trailing thumbnail bytes after EOI hold a spurious SOF with
    # different dims — the walk must stop at EOI and keep the real dims
    good = b"\xff\xd8" + _sof(16, 32) + b"\xff\xd9" + _sof(1, 2)
    assert jpeg_dimensions(good) == (32, 16)

    # SOF-less stream: bytes after EOI must not be parsed as segments
    bad = b"\xff\xd8" + b"\xff\xd9" + _sof(5, 6)
    with pytest.raises(ValueError):
        jpeg_dimensions(bad)


def test_heaps_curve_empty_input(spark):
    from mintpy_spark.operators.corpus import heaps_curve

    empty = spark.createDataFrame([], "doc_id string, text string")
    out = heaps_curve(empty, buckets=10)
    assert out.columns == ["bucket", "docs_cum", "tokens_cum", "vocab_cum"]
    assert out.count() == 0


def test_seqstate_hot_key_spanning_many_batches(spark):
    """A key spanning many Arrow batches must be delivered to fn as ONE
    whole group (single fn call), with values intact."""
    import pandas as pd

    from mintpy_spark.operators.seqstate import map_sorted_groups

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        rows = [("hot", i, float(i)) for i in range(5000)]
        for k in "abcdefghij":
            rows += [(k, i, float(i)) for i in range(10)]
        src = spark.createDataFrame(rows, "k string, t int, v double")

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            # one output row per key group PER CALL: a split group would
            # surface as duplicate key rows downstream
            out = (
                pdf.groupby("k", sort=False)
                .agg(n=("v", "size"), s=("v", "sum"))
                .reset_index()
            )
            return out[["k", "n", "s"]]

        got = {
            r["k"]: (r["n"], r["s"])
            for r in map_sorted_groups(
                src, "k", ("t",), fn, "k string, n long, s double"
            ).collect()
        }
        assert len(got) == 11  # one row per key => whole-group delivery
        assert got["hot"] == (5000, float(sum(range(5000))))
        for k in "abcdefghij":
            assert got[k] == (10, 45.0)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_seqstate_null_key_raises(spark):
    import pandas as pd

    from mintpy_spark.operators.seqstate import map_sorted_groups

    src = spark.createDataFrame(
        [("a", 1, 1.0), (None, 2, 2.0)], "k string, t int, v double"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf

    with pytest.raises(Exception, match="NULL key"):
        map_sorted_groups(
            src, "k", ("t",), fn, "k string, t int, v double"
        ).collect()
