"""Dedup + similarity operator semantics against pure-Python oracles
(simulate-truth-then-recover, the reference's test pattern)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from mintpy_spark.operators import dedup as D
from mintpy_spark.operators import similarity as S


def _py_token_hash(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)


def _py_minhash(text: str, num_perm: int = D.NUM_PERM) -> list[int]:
    toks = {t for t in text.split(" ") if t}
    hs = [_py_token_hash(t) % D.HASH_P for t in toks]
    return [
        min((a * h + b) % D.HASH_P for h in hs)
        for (a, b) in D.perm_coeffs(num_perm)
    ]


def _py_simhash(text: str, bits: int = D.SIMHASH_BITS) -> int:
    toks = {t for t in text.split(" ") if t}
    out = 0
    for b in range(bits):
        vote = sum(1 if (_py_token_hash(t) >> b) & 1 else -1 for t in toks)
        if vote > 0:
            out |= 1 << b
    return out


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "a"),
    (1, "the quick brown fox jumps over the lazy cat", "a"),  # near-dup of 0
    (2, "completely different content about spark engines", "a"),
    (3, "the quick brown fox jumps over the lazy dog", "b"),  # exact dup, other block
    (4, "one two", "b"),  # < 3 tokens
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, source string")


def test_minhash_signatures_match_python(docs_df):
    rows = {r.doc_id: r for r in D.minhash_signatures(docs_df).collect()}
    for doc_id, text, _ in DOCS:
        expect = _py_minhash(text)
        got = [rows[doc_id][f"m{i}"] for i in range(D.NUM_PERM)]
        assert got == expect, f"doc {doc_id}"


def test_minhash_near_dups_finds_the_pair(docs_df):
    pairs = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in D.minhash_near_dups(docs_df, threshold=0.5).collect()
    }
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0  # identical docs
    assert (0, 1) in pairs or (1, 3) in pairs  # 8/10 token overlap
    assert all(a < b for (a, b) in pairs)


def test_simhash_matches_python(docs_df):
    rows = {r.doc_id: r.simhash for r in D.simhash(docs_df).collect()}
    for doc_id, text, _ in DOCS:
        assert rows[doc_id] == _py_simhash(text), f"doc {doc_id}"


def test_simhash_near_dups_blocked_by_source(docs_df):
    pairs = {(r.doc_a, r.doc_b) for r in
             D.simhash_near_dups(docs_df, max_hamming=3).collect()}
    # 0 and 3 are identical but in different blocks -> must NOT pair
    assert (0, 3) not in pairs
    assert (0, 1) in pairs  # near-dup, same block, hamming small


def test_hyperplane_bucket_matches_python(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(20, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r.bucket for r in S.with_bucket(df, dim=8).collect()}
    planes = S.plane_signs(8)
    for i, v in enumerate(vecs):
        fx = np.floor(v.astype(np.float64) * S.SCALE).astype(np.int64)
        expect = sum(
            (1 << j) for j, row in enumerate(planes) if int(fx @ np.array(row)) > 0
        )
        assert got[i] == expect, f"vec {i}"


def test_ann_lsh_subset_of_exact_ranking(spark):
    rng = np.random.default_rng(11)
    base = rng.normal(size=8)
    rows = []
    for i in range(50):
        noise = rng.normal(size=8) * (0.01 if i < 5 else 2.0)
        rows.append((i, (base + noise).astype(np.float32).tolist(), 0))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = S.ann_topk_lsh(df, query_id=0, k=5, dim=8).collect()
    assert len(got) >= 1  # near-clones land in the query's bucket
    sims = [r.cos_sim for r in got]
    assert sims == sorted(sims, reverse=True)
    # the very-near clones (ids 1..4) should dominate the hits we do get
    near = {r.vec_id for r in got if r.cos_sim > 0.99}
    assert near.issubset({1, 2, 3, 4})
