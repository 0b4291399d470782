"""Unit tests for batch-h: exact substring-span dedup (duplicated
k-token-window census) and its per-source rollup."""

from __future__ import annotations


def test_duplicated_window_fraction_known_docs(spark):
    from mintpy_spark.operators.dedup import duplicated_window_fraction

    # k=3 windows so the fixtures stay hand-checkable.
    docs = spark.createDataFrame(
        [
            # doc1: toks a b c d -> windows [a b c, b c d]
            (1, "a b c d"),
            # doc2 shares "a b c" with doc1 -> that window is duplicated
            (2, "a b c x"),
            # doc3: internal repeat "p q r p q r p q r":
            # windows = pqr,qrp,rpq,pqr,qrp,rpq,pqr -> every window string
            # occurs >= 2 times -> all 7 duplicated
            (3, "p q r p q r p q r"),
            # doc4: all-unique windows
            (4, "u v w z"),
            # doc5: too short for k=3 -> omitted
            (5, "one two"),
            (6, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in duplicated_window_fraction(docs, k=3).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1].n_windows == 2 and out[1].dup_windows == 1
    assert out[1].dup_bp == 5000
    assert out[2].n_windows == 2 and out[2].dup_windows == 1
    assert out[3].n_windows == 7 and out[3].dup_windows == 7
    assert out[3].dup_bp == 10000
    assert out[4].n_windows == 2 and out[4].dup_windows == 0
    assert out[4].dup_bp == 0


def test_duplicated_window_multiplicity_counts_positions(spark):
    """A window repeated m times in one doc counts all m positions as
    duplicated (corpus occurrences >= 2), matching Lee et al.'s span
    accounting rather than a distinct-window ratio."""
    from mintpy_spark.operators.dedup import duplicated_window_fraction

    docs = spark.createDataFrame(
        [(1, "x y x y x y")],  # k=2: [xy, yx, xy, yx, xy] all dup
        "doc_id long, text string",
    )
    r = duplicated_window_fraction(docs, k=2).collect()[0]
    assert r.n_windows == 5 and r.dup_windows == 5


def test_source_dup_profile_includes_short_docs(spark, tmp_path):
    """Docs below k tokens still count in n_docs but not n_scored."""
    import mintpy_spark.queries as Q
    from mintpy_spark.queries_dedup2 import _SPANS_K, source_dup_profile

    docs = spark.createDataFrame(
        [
            (1, "s", " ".join(["tok%d" % i for i in range(_SPANS_K)])),
            (2, "s", "short"),
            (3, "t", "also short"),
        ],
        "doc_id long, source string, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.source: r
        for r in source_dup_profile(spark, str(tmp_path)).collect()
    }
    assert out["s"].n_docs == 2 and out["s"].n_scored == 1
    assert out["s"].n_windows == 1 and out["s"].dup_windows == 0
    assert out["t"].n_docs == 1 and out["t"].n_scored == 0
    assert out["t"].n_windows == 0 and out["t"].dup_bp == 0
    assert set(Q._ORACLES) >= {"dedup_substring_spans", "source_dup_profile"}
