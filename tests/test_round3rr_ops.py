"""Planted-truth tests for batch rr (temperature mixture, truncation
loss, calibration bins): exact integer mixture math on hand fixtures."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    """Source A: one 100-char doc; source B: one 400-char doc (mixture
    weights isqrt: 10 vs 20). Calibration rows: an en doc at stopword
    bin 8 and a zh doc at bin 0."""
    rows = [
        (1, "the the the the cat", "en", "A", 100),
        (2, "xyz abc", "zh", "B", 400),
    ]
    p = tmp_path_factory.mktemp("rr") / "d"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{p}/documents.parquet")
    return str(p)


def test_mixture_shares_and_rates(spark, docs_dir):
    import __spark_entry__ as E

    out = {r.source: r for r in E.queries()["sample_temperature_mixture"](spark, docs_dir).collect()}
    a, b = out["A"], out["B"]
    # wt_A=isqrt(100)=10, wt_B=isqrt(400)=20, sw=30, budget=250
    assert (a.n_docs, a.chars) == (1, 100) and (b.n_docs, b.chars) == (1, 400)
    assert a.share_bp == 3333 and b.share_bp == 6667  # rounded 1/3, 2/3
    # rate = budget*share/chars, ceil: A -> 250*(10/30)/100 = 83.33% -> 8334
    assert a.rate_bp == 8334 and b.rate_bp == 4167
    assert 0 <= a.n_sampled <= 1 and 0 <= b.n_sampled <= 1


def test_truncation_loss_exact(spark, docs_dir):
    import __spark_entry__ as E

    rows = E.queries()["truncation_loss_audit"](spark, docs_dir).collect()
    out = {(r.source, r.max_len): r for r in rows}
    assert len(rows) == 6  # 2 sources x 3 thresholds
    r = out[("B", 256)]
    assert (r.n_truncated, r.chars_lost) == (1, 144)
    assert r.loss_bp == 3600  # 144/400
    assert out[("B", 1024)].chars_lost == 0
    assert out[("A", 256)].chars_lost == 0
    assert out[("A", 256)].n_truncated == 0


def test_calibration_bins_exact(spark, docs_dir):
    import __spark_entry__ as E

    out = {r.bin: r for r in E.queries()["quality_calibration_bins"](spark, docs_dir).collect()}
    # "the the the the cat": 4 stopwords / 5 tokens -> bin (40 DIV 5) = 8
    assert out[8].n_docs == 1 and out[8].n_en == 1 and out[8].en_rate_bp == 10000
    # "xyz abc": 0 stopwords -> bin 0, not en
    assert out[0].n_docs == 1 and out[0].n_en == 0 and out[0].en_rate_bp == 0
