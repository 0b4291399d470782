"""Sequence packing (operators/packing.py): invariants + a pure-Python
reference for the next-fit fold."""

from __future__ import annotations

import pytest

from mintpy_spark.operators.packing import (
    pack_concat_chunks,
    pack_next_fit,
    token_count,
)

CAP = 16


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # (doc_id, text, source): token counts 3, 5, 9, 20(oversized), 1
        (1, "a b c", "s1"),
        (2, "a b c d e", "s1"),
        (3, " ".join("x" * 1 for _ in range(9)), "s1"),
        (4, " ".join(["y"] * 20), "s1"),
        (5, "z", "s1"),
        (6, "m n o p", "s2"),
        (7, "", "s2"),          # '' splits to [''] -> 1 token everywhere
        (8, None, "s2"),        # NULL -> 0 tokens, spans no chunk
        (9, " ".join(["q"] * 15), "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_token_count_parity_rules(spark):
    df = spark.createDataFrame(
        [("a b",), ("a  b",), ("a b ",), ("",), (None,)], "t string"
    ).select(token_count("t").alias("n"))
    # double space and trailing space keep the empty token (python
    # str.split(' ') and DuckDB string_split agree)
    assert [r.n for r in df.collect()] == [2, 3, 3, 1, 0]


def test_concat_chunks_exact_fill(spark, docs):
    out = pack_concat_chunks(docs, capacity=CAP).collect()
    by = {(r.source, r.chunk_id): r for r in out}
    # s1 stream: 3+5+9+20+1 = 38 tokens -> chunks of 16,16,6
    s1 = sorted(c for (s, c) in by if s == "s1")
    assert s1 == [0, 1, 2]
    assert [by[("s1", c)].tok_fill for c in s1] == [16, 16, 6]
    # total fill == total tokens; every non-final chunk is exactly full
    assert sum(by[("s1", c)].tok_fill for c in s1) == 38
    # doc 4 (20 tokens) starts in chunk 0 at offset 17 -> spans 0,1,2
    assert by[("s1", 2)].n_docs >= 1
    # s2 stream: 4+1+0+15 = 20 tokens -> 16,4 and the NULL doc vanishes
    s2 = sorted(c for (s, c) in by if s == "s2")
    assert [by[("s2", c)].tok_fill for c in s2] == [16, 4]
    # n_starts sums to the number of nonzero-token docs
    assert sum(r.n_starts for r in out) == 8


def _next_fit_ref(toks, cap):
    bins, b, fill = [], 0, cap + 1
    for t in toks:
        if fill + t > cap:
            b, fill = b + 1, t
        else:
            fill += t
        bins.append(b)
    return bins


def test_next_fit_matches_reference(spark, docs):
    out = pack_next_fit(docs, capacity=CAP).collect()
    got = {
        src: [
            (r.doc_id, r.tok, r.bin_id)
            for r in sorted(out, key=lambda r: r.doc_id)
            if r.source == src
        ]
        for src in ("s1", "s2")
    }
    for src, rows in got.items():
        toks = [t for (_, t, _) in rows]
        assert [b for (_, _, b) in rows] == _next_fit_ref(toks, CAP)
    # no bin overflows unless it holds a single oversized document
    from collections import defaultdict

    fills = defaultdict(list)
    for r in out:
        fills[(r.source, r.bin_id)].append(r.tok)
    for (_, _), ts in fills.items():
        assert sum(ts) <= CAP or len(ts) == 1
