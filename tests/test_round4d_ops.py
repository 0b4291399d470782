"""Round-4 batch d planted truth: readability scores and Heaps-curve
buckets computed by hand for tiny corpora."""

from __future__ import annotations

import math


def test_readability_scores_planted(spark):
    from mintpy_spark.operators.corpus import readability_scores

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),     # 6 words, 6 vowel groups
            (1, "rhythm " * 20),               # 20 words, 20 'y' groups
            (2, ""),                           # empty -> NULL scores
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.asDict() for r in readability_scores(docs).collect()}

    # doc 0: W=6, SY=6, S=ceil(6/15)=1
    w, sy, s = 6.0, 6.0, 1.0
    assert got[0]["n_words"] == 6 and got[0]["n_syllables"] == 6
    assert got[0]["n_sentences"] == 1
    assert got[0]["flesch_bp"] == math.floor(
        (206.835 - 1.015 * (w / s) - 84.6 * (sy / w)) * 100
    )
    assert got[0]["fk_bp"] == math.floor(
        (0.39 * (w / s) + 11.8 * (sy / w) - 15.59) * 100
    )
    # doc 1: 'rhythm' has exactly one vowel-group ('y'); S=ceil(20/15)=2
    assert got[1]["n_words"] == 20 and got[1]["n_syllables"] == 20
    assert got[1]["n_sentences"] == 2
    # doc 2: zero words -> NULL scores, zero counts
    assert got[2]["n_words"] == 0 and got[2]["flesch_bp"] is None
    assert got[2]["fk_bp"] is None


def test_heaps_curve_planted(spark):
    from mintpy_spark.operators.corpus import heaps_curve

    # 4 docs, 2 buckets: bucket 1 = docs {10, 20}, bucket 2 = {30, 40}
    docs = spark.createDataFrame(
        [
            (10, "a b c"),        # 3 tokens, vocab {a,b,c}
            (20, "a a d"),        # 3 tokens, new {d}
            (30, "e b"),          # 2 tokens, new {e}
            (40, ""),             # zero-token doc still ranks
        ],
        "doc_id long, text string",
    )
    got = {r.bucket: r.asDict() for r in heaps_curve(docs, buckets=2).collect()}
    assert got[1]["docs_cum"] == 2
    assert got[1]["tokens_cum"] == 6
    assert got[1]["vocab_cum"] == 4          # a b c d
    assert got[2]["docs_cum"] == 4
    assert got[2]["tokens_cum"] == 8
    assert got[2]["vocab_cum"] == 5          # + e
