"""Coherence->weight generators vs NumPy oracles (reference:
decorrelation.py:337-376 coherence2weight family)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from mintpy_spark.functions import weights as W


def _col_eval(spark, coh_values, **kw):
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(coh_values)), "coh": coh_values})
    )
    out = df.select("i", W.coherence2weight(F.col("coh"), **kw).alias("w")).orderBy("i")
    return np.array([r.w for r in out.collect()], dtype=np.float64)


def test_fisher_matches_formula(spark):
    coh = [0.1, 0.5, 0.9, 0.999, float("nan")]
    L = 20
    got = _col_eval(spark, coh, weight_func="fisher", L=L)
    c = np.array([0.1, 0.5, 0.9, 1 - W.FISHER_EPS, W.EPSILON])
    expect = (2.0 * L * c * c / (1 - c * c)).astype(np.float32)
    assert np.allclose(got, expect, rtol=1e-6)


def test_coherence_weight_clips(spark):
    got = _col_eval(spark, [0.0, 0.01, 0.5, float("nan")], weight_func="coherence")
    assert np.allclose(got, np.float32([W.EPSILON, W.EPSILON, 0.5, W.EPSILON]))


def test_var_weight_matches_lut_indexing(spark):
    L = 20
    grid, var = W.phase_variance_lut(L)
    coh = [0.03, 0.2, 0.5, 0.8, 0.99, float("nan")]
    got = _col_eval(spark, coh, weight_func="var", L=L)
    c = np.array([W.EPSILON, 0.2, 0.5, 0.8, 0.99, W.EPSILON])
    c = np.clip(c, grid.min(), grid.max())
    idx = ((c - grid.min()) / W.COH_STEP).astype(np.int16)
    expect = (1.0 / var[idx]).astype(np.float32)
    assert np.allclose(got, expect, rtol=1e-6)
    # monotone: higher coherence -> lower phase variance -> higher weight
    assert np.all(np.diff(got[:5]) > 0)


def test_phase_pdf_properties():
    """The DS phase PDF integrates to 1 and is symmetric (sanity of the
    published Eq. 4.2.24 closed form for integer L)."""
    coh = np.array([0.1, 0.5, 0.9])
    pdf = W.phase_pdf_ds(4, coh, phi_num=2001)
    dphi = 2 * np.pi / 2001
    mass = pdf.sum(axis=0) * dphi
    assert np.allclose(mass, 1.0, atol=5e-3)
    assert np.allclose(pdf, pdf[::-1, :], atol=1e-9)  # even in phi
    # sharper peak at higher coherence
    assert pdf[1000, 2] > pdf[1000, 1] > pdf[1000, 0]


def test_uniform_returns_null(spark):
    df = spark.range(3).select(F.lit(0.7).alias("coh"))
    out = df.select(W.coherence2weight(F.col("coh"), weight_func="sbas").alias("w"))
    assert all(r.w is None for r in out.collect())
