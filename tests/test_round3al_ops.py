"""Batch al planted truth: PQ ANN finds planted nearest neighbors,
keeps high recall vs exact cosine on clustered data, and is
partitioning-invariant."""

from __future__ import annotations

import random


def _clustered(rng: random.Random, n_clusters=4, per=30, dim=32):
    """Clustered vectors: cluster c centered at a distinct orthant
    corner; ids are interleaved round-robin across clusters (i % C), so
    the deterministic sample codebook (lowest ids) covers every cluster;
    id 0 sits in cluster 0."""
    centers = []
    for c in range(n_clusters):
        centers.append([(5.0 if (c >> (d % 3)) & 1 else -5.0) + 0.3 * d / dim
                        for d in range(dim)])
    rows = []
    for i in range(n_clusters * per):
        c = i % n_clusters
        v = [round(centers[c][d] + rng.gauss(0, 0.4), 4) for d in range(dim)]
        rows.append((i, v, c))
    return rows


def test_pq_topk_recall_vs_exact(spark):
    from pyspark.sql import functions as F

    from mintpy_spark.operators.similarity import pq_topk

    rng = random.Random(5)
    rows = _clustered(rng)
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = pq_topk(emb, query_id=0, k=10, n_candidates=40,
                  num_subspaces=4, num_codes=16).collect()
    assert len(got) == 10
    ids = {r.vec_id for r in got}
    assert 0 not in ids
    # every reported neighbor of a cluster-0 query must be cluster 0
    labels = {r[0]: r[2] for r in rows}
    assert all(labels[i] == 0 for i in ids)
    # recall vs exact cosine top-10 (clusters are well separated)
    import math

    qv = rows[0][1]
    qn = math.sqrt(sum(x * x for x in qv))

    def cos(v):
        return sum(a * b for a, b in zip(qv, v)) / (
            qn * math.sqrt(sum(x * x for x in v))
        )

    exact = sorted(
        ((cos(v), i) for i, v, _ in rows if i != 0), key=lambda t: (-t[0], t[1])
    )[:10]
    exact_ids = {i for _, i in exact}
    assert len(ids & exact_ids) >= 8, (ids, exact_ids)
    # ranks ordered by exact cosine, descending
    ranked = sorted(got, key=lambda r: r.rank)
    sims = [r.cos_sim for r in ranked]
    assert sims == sorted(sims, reverse=True)


def test_pq_topk_partitioning_invariant(spark):
    from mintpy_spark.operators.similarity import pq_topk

    rng = random.Random(9)
    rows = _clustered(rng, n_clusters=3, per=20)
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    a = pq_topk(emb, query_id=0, k=5).collect()
    b = pq_topk(emb.repartition(13), query_id=0, k=5).collect()
    key = lambda r: (r.rank, r.vec_id, r.pq_dot, r.cos_sim)
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_pq_topk_missing_query_raises(spark):
    import pytest

    from mintpy_spark.operators.similarity import pq_topk

    emb = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="query_id 99"):
        pq_topk(emb, query_id=99)
