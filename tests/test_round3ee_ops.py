"""Round-3 batch ee: sliding HDR quantiles + power-iteration eigenvector
— cover-merge equivalence and numpy seed-and-recover."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
from pyspark.sql import functions as F

D = dt.datetime


def test_sliding_hdr_cover_equals_direct(spark):
    """Merging day sketches across the 7-day cover must equal building
    the sketch directly from each window's raw rows (counter-sum merge
    is lossless) — the property the driver oracle checks at SF, proven
    here on a hand fixture."""
    from mintpy_spark.operators.sketch import hdr_merge, hdr_tier

    rows = []
    for day in range(10):
        for v in range(1, 30):
            rows.append((day, v * (day + 1)))
    df = spark.createDataFrame(rows, "day long, cents long")
    day_sk = hdr_tier(df, "cents", key_cols=("day",))
    cover = day_sk.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("_i"), "day", "bucket", "cnt"
    ).select((F.col("day") + F.col("_i")).alias("wd"), "bucket", "cnt")
    days = df.select(F.col("day").alias("wd")).distinct()
    merged = hdr_merge(cover.join(days, "wd"), key_cols=("wd",))
    # direct: for each day, sketch over raw rows of [day-6, day]
    direct_rows = []
    for wd in range(10):
        win = df.where((F.col("day") >= wd - 6) & (F.col("day") <= wd)).select(
            F.lit(wd).alias("wd"), "cents"
        )
        direct_rows.append(hdr_tier(win, "cents", key_cols=("wd",)))
    direct = direct_rows[0]
    for d in direct_rows[1:]:
        direct = direct.unionByName(d)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_top_eigen_recovers_planted_direction(spark):
    from mintpy_spark.operators.similarity import top_eigen

    rng = np.random.RandomState(7)
    dim = 16
    u = rng.randn(dim)
    u /= np.linalg.norm(u)
    # strong rank-1 signal + small isotropic noise
    X = np.outer(rng.randn(400) * 10.0, u) + rng.randn(400, dim) * 0.1
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    [(v, lam)] = top_eigen(df, "embedding", dim=dim, iters=12)
    v = np.array(v)
    truth_vals, truth_vecs = np.linalg.eigh(X.T @ X)
    top = truth_vecs[:, -1]
    cos = abs(float(v @ top))
    assert cos > 0.999, cos
    assert abs(lam - truth_vals[-1]) / truth_vals[-1] < 0.01


def test_top_eigen_zero_input_safe(spark):
    from mintpy_spark.operators.similarity import top_eigen

    df = spark.createDataFrame(
        [(0, [0.0] * 4), (1, [0.0] * 4)], "vec_id long, embedding array<double>"
    )
    [(v, lam)] = top_eigen(df, "embedding", dim=4, iters=3)
    assert lam == 0.0 and all(math.isfinite(c) for c in v)
