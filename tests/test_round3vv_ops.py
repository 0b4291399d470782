"""Planted-truth tests for batch vv (bigram LM, TTR/hapax, vocabulary
census): tiny corpus with hand-countable n-gram statistics."""

from __future__ import annotations

import math

import pytest


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    """doc 1 'a b a b' (fluent under the corpus LM), doc 2 'b a' and
    doc 3 'a a' (the rare bigram), doc 4 single-token (excluded from
    bigram scoring). Corpus unigrams: a=5? -> a appears 4? count below.
    Vocabulary = {{a, b, c}}."""
    rows = [
        (1, "a b a b", "en", "A", 7),
        (2, "b a", "en", "A", 3),
        (3, "a a", "zh", "B", 3),
        (4, "c", "zh", "B", 1),
    ]
    p = tmp_path_factory.mktemp("vv") / "d"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{p}/documents.parquet")
    return str(p)


def test_bigram_logprob_exact(spark, corpus_dir):
    import __spark_entry__ as E

    out = {r.doc_id: r for r in E.queries()["doc_bigram_logprob"](spark, corpus_dir).collect()}
    # corpus: unigrams a=5, b=3, c=1 -> V=3
    # bigram counts: 'a b'=2, 'b a'=2, 'a a'=1
    uni = {"a": 5, "b": 3, "c": 1}
    fbg = {("a", "b"): 2, ("b", "a"): 2, ("a", "a"): 1}

    def lpq(w1, w2):
        return math.floor(
            math.log((fbg[(w1, w2)] + 1.0) / (uni[w1] + 3.0)) * 1e6 + 0.5
        )

    # doc 1: bigrams ab, ba, ab
    e1 = round((2 * lpq("a", "b") + lpq("b", "a")) / (3 * 1e6), 4)
    assert out[1].n_bigrams == 3
    assert out[1].logprob == pytest.approx(e1, abs=1e-9)
    # doc 3: the once-seen bigram scores lower than doc 1's common ones
    assert out[3].n_bigrams == 1
    assert out[3].logprob < out[1].logprob
    # single-token doc has no bigrams
    assert 4 not in out


def test_ttr_hapax_per_doc(spark, corpus_dir):
    import __spark_entry__ as E

    out = {r.doc_id: r for r in E.queries()["text_ttr_hapax"](spark, corpus_dir).collect()}
    r1 = out[1]  # 'a b a b': 4 tokens, 2 types, 0 hapax
    assert (r1.n_tokens, r1.n_types, r1.n_hapax) == (4, 2, 0)
    assert r1.ttr_bp == 5000
    r2 = out[2]  # 'b a': both hapax within the doc
    assert (r2.n_tokens, r2.n_types, r2.n_hapax, r2.ttr_bp) == (2, 2, 2, 10000)
    r3 = out[3]  # 'a a'
    assert (r3.n_tokens, r3.n_types, r3.n_hapax, r3.ttr_bp) == (2, 1, 0, 5000)


def test_vocab_census_per_lang(spark, corpus_dir):
    import __spark_entry__ as E

    out = {r.lang: r for r in E.queries()["vocab_frequency_census"](spark, corpus_dir).collect()}
    en = out["en"]  # docs 1+2: a=3, b=3
    assert (en.n_tokens, en.vocab, en.n_hapax, en.n_dis, en.max_freq) == (6, 2, 0, 0, 3)
    zh = out["zh"]  # docs 3+4: a=2, c=1
    assert (zh.n_tokens, zh.vocab, zh.n_hapax, zh.n_dis, zh.max_freq) == (3, 2, 1, 1, 2)
    assert zh.hapax_bp == 5000
