"""Round-4 batch l planted truth: the in-query two-batch fold emits a
cross-batch near-dup pair exactly once."""

from __future__ import annotations

import os
import tempfile


def test_dedup_index_realtime_check_cross_batch_pair(spark):
    from mintpy_spark.queries_tiers import dedup_index_realtime_check

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    rows = [
        (0, base, "en", "web", len(base)),
        # near-twin of doc 0 but with a doc_id in the SECOND half, so the
        # pair can only come from the stored-vs-new probe
        (90, base + "lambda", "en", "web", len(base) + 7),
        (1, "one two three four five six seven eight nine ten " * 6,
         "en", "web", 300),
        (91, "completely different words entirely unrelated corpus " * 6,
         "en", "web", 320),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        got = dedup_index_realtime_check(spark, d).collect()
    pairs = {(r.doc_a, r.doc_b) for r in got}
    assert (0, 90) in pairs
    # emitted exactly once despite two probes (distinct() on candidates)
    assert len([p for p in pairs if p == (0, 90)]) == 1
    assert all(a < b for a, b in pairs)
