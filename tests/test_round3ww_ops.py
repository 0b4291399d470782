"""Planted-truth tests for batch ww (embedding geometry audits): 2-D
vectors with hand-computable norms, variances, and centroid shifts."""

from __future__ import annotations

import math

import pytest


@pytest.fixture(scope="module")
def emb_dir(spark, tmp_path_factory):
    """Label 0: (1, 0) and (0, 1) — centroid (0.5, 0.5).
    Label 1: (1, 1) twice — centroid (1, 1). Global centroid (0.75,
    0.75)? no: mean of all four = (0.5+2)/4 = (0.625, 0.625) wait:
    x-coords 1,0,1,1 -> 0.75; y 0,1,1,1 -> 0.75. Quantized x128."""
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.0, 1.0], 0),
        (3, [1.0, 1.0], 1),
        (4, [1.0, 1.0], 1),
    ]
    p = tmp_path_factory.mktemp("ww") / "e"
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{p}/embeddings.parquet")
    return str(p)


def test_norm_census(spark, emb_dir):
    import __spark_entry__ as E

    out = {r.label: r for r in E.queries()["embedding_norm_census"](spark, emb_dir).collect()}
    # quantized: 1.0 -> 128; norms^2: label 0 both 128^2; label 1 2*128^2
    assert (out[0].n_vecs, out[0].min_sq, out[0].max_sq) == (2, 16384, 16384)
    assert out[0].mean_sq == 16384 and out[0].sum_sq == 32768
    assert (out[1].min_sq, out[1].max_sq) == (32768, 32768)


def test_dim_variance_rank(spark, emb_dir):
    import __spark_entry__ as E

    rows = E.queries()["embedding_dim_variance_topk"](spark, emb_dir).collect()
    out = {r.pos: r for r in rows}
    # dim 1 values: 128,0,128,128 -> n*qq - s^2 = 4*3*16384 - (384)^2
    num1 = 4 * (3 * 128 * 128) - (3 * 128) ** 2
    # dim 2 values: 0,128,128,128 -> same by symmetry
    assert out[1].var_num == num1 and out[2].var_num == num1
    # tie broken by pos: dim 1 ranks first
    assert out[1].rnk == 1 and out[2].rnk == 2
    assert out[1].variance == pytest.approx(round(num1 / 16.0, 4))


def test_centroid_shift(spark, emb_dir):
    import __spark_entry__ as E

    out = {r.label: r for r in E.queries()["embedding_centroid_shift"](spark, emb_dir).collect()}
    # label 0 centroid (64, 64), global (96, 96): shift = sqrt(2)*32
    # exact numerator: per pos (s*n - t*nl)^2 with s=128, n=4, t=384, nl=2
    num = 2 * (128 * 4 - 384 * 2) ** 2
    assert out[0].shift_num == num
    assert out[0].shift == pytest.approx(round(math.sqrt(num) / (2 * 4), 4))
    assert out[0].shift == pytest.approx(round(32 * math.sqrt(2), 4))
    # label 1 centroid (128,128), diff (32,32) -> same magnitude shift
    assert out[1].shift == pytest.approx(out[0].shift)
