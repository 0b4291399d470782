"""Round-3 batch k: seasonal-naive MASE, PMI collocations, CDC chunk
dedup — known-answer tests.

CDC fixtures use precomputed boundary properties of the portable 60-bit
hash: h60('t7') % 8 == 0 (chunk-starting token), h60('w0'..'w4') % 8 != 0
(interior tokens)."""

from __future__ import annotations

import datetime as dt


def _events(spark, counts, etype="a"):
    rows, eid = [], 0
    for d, c in enumerate(counts):
        for i in range(c):
            rows.append((eid, dt.datetime(2024, 1, 1) + dt.timedelta(days=d, minutes=i), etype))
            eid += 1
    return spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")


def test_mase_perfect_seasonal_is_zero(spark):
    from mintpy_spark.operators.forecast import snaive_mase_daily

    # exactly 7-periodic counts: seasonal-naive error = 0, naive-1 > 0
    counts = [1, 2, 3, 4, 5, 6, 7] * 3
    out = snaive_mase_daily(_events(spark, counts)).collect()[0]
    assert out["n_scored"] == 14 and out["err_s"] == 0
    assert out["err_1"] > 0
    assert out["mase_bp"] == 0


def test_mase_constant_series_is_null(spark):
    from mintpy_spark.operators.forecast import snaive_mase_daily

    out = snaive_mase_daily(_events(spark, [3] * 10)).collect()[0]
    assert out["err_1"] == 0 and out["mase_bp"] is None


def test_mase_known_ratio(spark):
    from mintpy_spark.operators.forecast import snaive_mase_daily

    # counts 1..10 (linear trend): c(d)-c(d-7)=7 on 3 days -> err_s=21,
    # n_scored=3; c(d)-c(d-1)=1 on 9 days -> err_1=9, n_naive=9;
    # mase = (21/3)/(9/9) = 7.0 -> 70000 bp
    out = snaive_mase_daily(_events(spark, list(range(1, 11)))).collect()[0]
    assert (out["n_scored"], out["err_s"]) == (3, 21)
    assert (out["n_naive"], out["err_1"]) == (9, 9)
    assert out["mase_bp"] == 70000


def test_pmi_ranks_exclusive_pair_first(spark):
    from mintpy_spark.operators.tfidf import pmi_top_pairs

    # "nx ny" occur ONLY together (5 times); "c c" pairs are frequent
    # but c is ubiquitous -> low PMI.
    docs = spark.createDataFrame(
        [(i, "nx ny " + "c " * 20) for i in range(5)],
        "doc_id long, text string",
    )
    rows = pmi_top_pairs(docs, top_k=3, min_pair_count=5).collect()
    assert (rows[0]["tok_a"], rows[0]["tok_b"]) == ("nx", "ny")
    # exclusive pair: c_ab=5, positional counts c_a=5 (nx), c_b=10
    # (ny: 5 as tok_b of (nx,ny) + 5 as tok_a of (ny,c))
    assert rows[0]["c_ab"] == 5 and rows[0]["c_a"] == 5
    assert rows[0]["score"] == (5 * 10**12) // (5 * rows[0]["c_b"])


def test_cdc_chunks_boundary_rule(spark):
    from mintpy_spark.operators.dedup import cdc_chunk_positions

    # 't7' starts a new chunk; w* are interior -> "w0 w1" | "t7 w2"
    docs = spark.createDataFrame(
        [(0, "w0 w1 t7 w2")], "doc_id long, text string"
    )
    assert cdc_chunk_positions(docs, window_mod=8).count() == 2
    # leading boundary token: first token always starts chunk 0, so a
    # boundary at position 0 adds nothing
    docs2 = spark.createDataFrame([(0, "t7 w2")], "doc_id long, text string")
    assert cdc_chunk_positions(docs2, window_mod=8).count() == 1


def test_cdc_dedup_insertion_robust(spark):
    from mintpy_spark.operators.dedup import cdc_chunk_dedup

    # A = P + S, B = P' + S where P' = P with one extra token and a
    # boundary ('t7') separates prefix from suffix: the suffix chunk
    # survives the insertion and is flagged duplicated in BOTH docs.
    a = "w0 w1 t7 w2 w3"
    b = "w0 w1 w4 t7 w2 w3"
    docs = spark.createDataFrame(
        [(0, a), (1, b)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in cdc_chunk_dedup(docs, window_mod=8).collect()}
    assert rows[0]["n_chunks"] == 2 and rows[1]["n_chunks"] == 2
    # exactly the shared suffix chunk "t7 w2 w3" is duplicated
    assert rows[0]["dup_chunks"] == 1 and rows[1]["dup_chunks"] == 1
    assert rows[0]["dup_bp"] == 5000


def test_cdc_single_token_doc(spark):
    from mintpy_spark.operators.dedup import cdc_chunk_dedup

    docs = spark.createDataFrame(
        [(0, "w0"), (1, "")], "doc_id long, text string"
    )
    rows = cdc_chunk_dedup(docs, window_mod=8).collect()
    assert len(rows) == 1  # empty doc has no tokens -> omitted
    assert rows[0]["n_chunks"] == 1 and rows[0]["dup_chunks"] == 0
