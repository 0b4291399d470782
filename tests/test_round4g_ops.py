"""Round-4 batch g planted truth: JL projection signs, exact integer
distances, and the distortion ratio on a hand-built pair."""

from __future__ import annotations

import hashlib


def _sign(j: int, d: int) -> int:
    h = hashlib.md5(f"{j}_{d}".encode()).hexdigest()[0]
    return 1 if h in "01234567" else -1


def test_jl_projection_matches_reference_signs(spark):
    from mintpy_spark.operators.projection import jl_distortion_pairs

    dim, k, off = 4, 2, 1
    va = [0.5, -0.25, 0.125, 1.0]
    vb = [0.0, 0.5, -1.0, 0.25]
    df = spark.createDataFrame(
        [(0, va), (1, vb)], "vec_id long, embedding array<float>"
    )
    out = jl_distortion_pairs(
        df, "embedding", "vec_id", in_dim=dim, out_dim=k, pair_offset=off
    ).collect()
    assert len(out) == 1
    r = out[0].asDict()

    qa = [int(x * 10000 // 1) for x in va]
    qb = [0, 5000, -10000, 2500]
    # floor semantics for negatives
    import math

    qa = [math.floor(x * 10000) for x in va]
    qb = [math.floor(x * 10000) for x in vb]
    d2_full = sum((x - y) ** 2 for x, y in zip(qa, qb))
    pa = [sum(_sign(j, d) * qa[d] for d in range(dim)) for j in range(k)]
    pb = [sum(_sign(j, d) * qb[d] for d in range(dim)) for j in range(k)]
    d2_proj = sum((x - y) ** 2 for x, y in zip(pa, pb))
    assert r["d2_full"] == d2_full
    assert r["d2_proj"] == d2_proj
    assert r["ratio_bp"] == (10000 * d2_proj) // (k * d2_full)


def test_jl_distortion_concentrates_at_scale(spark):
    """Property: over the sf0.001 embeddings, the mean distortion ratio
    sits near 10000 bp (unbiasedness of the ±1 projection)."""
    from mintpy_spark.operators.projection import jl_distortion_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    rows = jl_distortion_pairs(
        emb, "embedding", "vec_id", in_dim=64, out_dim=8,
        pair_offset=n // 2,
    ).collect()
    assert len(rows) == n // 2
    ratios = [r.ratio_bp for r in rows if r.ratio_bp is not None]
    mean = sum(ratios) / len(ratios)
    # k=8 gives sigma ~ 50% per pair; the mean over n/2 pairs is tight
    assert 8000 < mean < 12000, mean
