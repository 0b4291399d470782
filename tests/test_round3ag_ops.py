"""Batch ag planted truth: prefix-filter set-similarity join vs brute
force on a seeded random corpus, with pairs engineered to straddle the
threshold."""

from __future__ import annotations

import hashlib
import itertools
import random

from mintpy_spark.operators.ssjoin import ssjoin_jaccard

N, T_NUM, T_DEN = 3, 4, 5


def _sh(text: str) -> set[int]:
    toks = [t for t in text.split(" ") if t != ""]
    return {
        int(hashlib.md5(" ".join(toks[i : i + N]).encode()).hexdigest()[:15], 16)
        for i in range(len(toks) - N + 1)
    }


def _brute(docs: list[tuple[int, str]]) -> dict[tuple[int, int], tuple[int, int]]:
    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        sa, sb = _sh(ta), _sh(tb)
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        uni = len(sa | sb)
        if inter * T_DEN >= uni * T_NUM:
            out[(ia, ib)] = (inter, uni)
    return out


def _run(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): (r.inter, r.uni)
        for r in ssjoin_jaccard(df, n=N, t_num=T_NUM, t_den=T_DEN).collect()
    }
    assert got == _brute(docs)
    return got


def test_ssjoin_matches_brute_force_random_corpus(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(40):
        base = " ".join(rng.choices(vocab, k=rng.randint(20, 60)))
        docs.append((i, base))
        if i % 5 == 0:
            # a near-duplicate: same text with a few tokens appended —
            # guaranteed high-Jaccard partner for doc i
            docs.append((1000 + i, base + " " + " ".join(rng.choices(vocab, k=3))))
    got = _run(spark, docs)
    assert got, "seeded corpus must produce at least one >=0.8 pair"


def test_ssjoin_threshold_boundary_exact(spark):
    # shared run of unique tokens: doc A = s1..s20, doc B = s1..s16 + 4
    # distinct tokens. Shingle sets: |A|=18, intersection=14, union=22+
    # — engineer around the 4/5 line with simple disjoint-suffix docs.
    shared = " ".join(f"s{i}" for i in range(40))
    a = (100, shared)
    b = (101, shared + " x1")          # inter=38, uni=39  (>= 4/5) in
    c = (102, shared + " y1 y2 y3 y4 y5 y6 y7 y8 y9 y10")
    got = _run(spark, [a, b, c])
    assert (100, 101) in got
    inter, uni = got[(100, 101)]
    assert inter * T_DEN >= uni * T_NUM
