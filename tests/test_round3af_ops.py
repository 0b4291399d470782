"""Batch af planted truth: winnowing fingerprints against a pure-Python
reference, the Schleimer guarantee, and triangle counts on known graphs."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mintpy_spark.operators.graph import triangle_count
from mintpy_spark.operators.winnow import (
    HASH_SPACE,
    MAX_POS,
    POS_SPACE,
    winnow_fingerprints,
    winnow_pairs,
)

K, W = 5, 4


def _py_winnow(text: str) -> set[tuple[int, int]]:
    """Independent reference: same md5 40-bit k-gram hash, same
    rightmost-min-tie rule, implemented with plain loops."""
    toks = [t for t in text.split(" ") if t != ""]
    if len(toks) < K + W - 1:
        return set()
    combined = []
    for i in range(len(toks) - K + 1):
        s = " ".join(toks[i : i + K])
        h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % HASH_SPACE
        combined.append(h * POS_SPACE + (MAX_POS - i))
    out = set()
    for j in range(W - 1, len(combined)):
        c = min(combined[j - W + 1 : j + 1])
        out.add((c >> 20, MAX_POS - (c % POS_SPACE)))
    return out


def test_winnow_matches_python_reference(spark):
    texts = [
        "a b c d e f g h i j k l m n o p",
        "x x x x x x x x x x",                    # all-equal hashes: tie rule
        "q w e r t y u i o p a s d f g h j k l",
        "one two three four five six seven eight",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df, k=K, w=W).collect():
        got.setdefault(r.doc_id, set()).add((r.fp_hash, r.fp_pos))
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _py_winnow(t), f"doc {i}"


def test_winnow_guarantee_shared_run(spark):
    # Two docs sharing a run of exactly K + W - 1 = 8 tokens must share
    # >= 1 fingerprint hash (Schleimer Thm 1); docs with disjoint
    # vocabularies share none.
    run = "r1 r2 r3 r4 r5 r6 r7 r8"
    docs = [
        (0, f"a1 a2 a3 a4 a5 a6 {run} a7 a8 a9 a10"),
        (1, f"b1 b2 b3 {run} b4 b5 b6 b7 b8 b9 b10 b11"),
        (2, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnow_pairs(df, k=K, w=W, min_shared=1, df_cap=50).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def _tri(spark, edges):
    df = spark.createDataFrame(edges, "pa long, pb long")
    return triangle_count(df).collect()[0]


def test_triangle_counts_known_graphs(spark):
    # K4: 4 triangles, 6 edges, 4 nodes — every vertex pair tied on
    # degree, so the count exercises the id tie-break.
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = _tri(spark, k4)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)
    # path graph: 0 triangles
    r = _tri(spark, [(1, 2), (2, 3), (3, 4)])
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 3, 0)
    # two triangles sharing an edge (bowtie-ish): nodes 1-2-3, 2-3-4
    r = _tri(spark, [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)])
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 5, 2)


def test_triangle_skew_star_plus_triangle(spark):
    # A hub of degree 12 with leaves (no triangles among leaves) plus one
    # triangle hanging off the hub — the degree-ordered wedge join must
    # not wedge at the hub for leaf pairs (orientation sends hub edges
    # OUT of the low-degree leaves, so the hub has tiny out-degree).
    star = [(100, i) for i in range(1, 13)]
    tri = [(100, 200), (100, 201), (200, 201)]
    r = _tri(spark, [(min(a, b), max(a, b)) for a, b in star + tri])
    assert r.n_triangles == 1
    assert r.n_nodes == 15 and r.n_edges == 15


def test_winnow_position_overflow_guard(spark):
    """A document whose k-gram count exceeds the 2^20 position packing
    must fail LOUDLY at execution (assert_true), never wrap silently;
    docs at or under the limit (and NULL text) pass through unharmed."""
    import pytest
    from mintpy_spark.operators.winnow import winnow_stats

    # 30 tokens: comfortably under the limit — runs clean, NULL text too.
    ok = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(30))), (2, None)],
        "doc_id long, text string",
    )
    rows = winnow_stats(ok, k=K, w=W).collect()
    assert len(rows) == 1 and rows[0].doc_id == 1

    # POS_SPACE + K tokens -> POS_SPACE + 1 k-grams: one over the packing.
    big = " ".join("x%d" % (i % 97) for i in range(POS_SPACE + K))
    bad = spark.createDataFrame([(3, big)], "doc_id long, text string")
    with pytest.raises(Exception, match="exceeds|wrap|ASSERT"):
        winnow_stats(bad, k=K, w=W).collect()
