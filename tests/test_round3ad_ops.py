"""Planted-truth tests for batch ccc (bipartite PageRank, LSH recall eval)."""

from __future__ import annotations

import datetime as dt

D = dt.datetime


def test_pagerank_bipartite_hand_computed(spark, tmp_path):
    import __spark_entry__ as E

    spark.createDataFrame(
        [(1, 101), (2, 102)],
        "o_orderkey long, o_custkey long",
    ).write.parquet(f"{tmp_path}/orders.parquet")
    # c101 - p1, c101 - p2, c102 - p1 (duplicate edge rows collapse)
    spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 1)],
        "l_orderkey long, l_partkey long",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")
    out = E.queries()["graph_pagerank_bipartite"](spark, str(tmp_path)).collect()
    got = {r.p_partkey: r.pagerank_fp for r in out}
    # N=4, pr0=250e9, base=37.5e9
    # c101 = base + 85*(pr0//2 + pr0//1)//100 = 356_250_000_000
    # c102 = base + 85*(pr0//2)//100         = 143_750_000_000
    # p1   = base + 85*(c101//2 + c102//1)//100 = 311_093_750_000
    # p2   = base + 85*(c101//2)//100           = 188_906_250_000
    assert got == {1: 311_093_750_000, 2: 188_906_250_000}


def test_lsh_recall_eval_perfect_on_exact_dups(spark, tmp_path):
    import __spark_entry__ as E

    text = "alpha beta gamma delta epsilon zeta eta theta"
    other = "one two three four five six seven eight nine ten"
    spark.createDataFrame(
        [(1, text, "en", "A", len(text)),
         (2, text, "en", "A", len(text)),      # exact dup of 1, same source
         (3, other, "en", "A", len(other)),    # unrelated
         (4, text, "en", "B", len(text))],     # dup of 1 but cross-source
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    row = E.queries()["dedup_lsh_recall_eval"](spark, str(tmp_path)).collect()[0]
    # truth: only (1,2); pred: LSH finds (1,2) with est 1.0; (1,4)/(2,4)
    # are filtered by the same-source restriction on both sides.
    assert (row.n_truth, row.n_pred, row.n_hit) == (1, 1, 1)
    assert (row.recall_bp, row.precision_bp) == (10000, 10000)
