"""Planted-truth tests for batch aaa (novelty share, langid confusion,
ship-latency quantiles)."""

from __future__ import annotations

import datetime as dt

import pytest

D = dt.datetime


def test_novelty_share(spark, tmp_path):
    import __spark_entry__ as E

    # doc 1 and 2 share one shingle ('a b c'); each also has a unique one
    spark.createDataFrame(
        [(1, "a b c d", "en", "A", 7),
         (2, "a b c e", "en", "A", 7),
         (3, "x y", "en", "A", 3)],  # too short for 3-shingles
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    out = {r.doc_id: r for r in E.queries()["shingle_novelty_share"](spark, str(tmp_path)).collect()}
    # doc 1 shingles: 'a b c' (df 2), 'b c d' (df 1) -> 1 of 2 novel
    assert (out[1].n_shingles, out[1].n_novel, out[1].novel_bp) == (2, 1, 5000)
    assert (out[2].n_shingles, out[2].n_novel) == (2, 1)
    assert 3 not in out  # no shingles at all


def test_langid_confusion_diagonal(spark, tmp_path):
    import __spark_entry__ as E

    en = "the quick brown fox jumps over the lazy dog and then some more"
    fr = "le renard brun rapide saute par dessus le chien paresseux et encore"
    spark.createDataFrame(
        [(1, en, "en", "A", len(en)),
         (2, en + " again and again", "en", "A", 80),
         (3, fr, "fr", "B", len(fr))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = E.queries()["langid_confusion_matrix"](spark, str(tmp_path)).collect()
    out = {(r.label, r.guess): r for r in rows}
    assert out[("en", "en")].cnt == 2 and out[("en", "en")].share_bp == 10000
    assert out[("fr", "fr")].cnt == 1
    # shares within a label sum to ~10000
    en_total = sum(r.share_bp for r in rows if r.label == "en")
    assert abs(en_total - 10000) <= 1


def test_ship_latency_discrete_quantiles(spark, tmp_path):
    import __spark_entry__ as E

    spark.createDataFrame(
        [(k, 1, "O", 1.0, D(1996, 1, 1), "1-URGENT") for k in range(10)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{tmp_path}/orders.parquet")
    # latencies 1..10 days, one line per order
    spark.createDataFrame(
        [(k, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", D(1996, 1, 2 + k))
         for k in range(10)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")
    rows = E.queries()["olap_ship_latency_quantiles"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    # n=10, days 1..10: rank(p50) = 9*50//100+1 = 5 -> 5 days
    assert (r.n_items, r.p50_days) == (10, 5)
    assert r.p90_days == 9  # rank 9*90//100+1 = 9
    assert r.p99_days == 9  # rank 9*99//100+1 = 9 (discrete, no interp)
