"""Round-3 batch s: Count-Min sketch tier, priority sampling, Zipf
slope — property and known-answer tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _docs(spark):
    rows = []
    # source A: 'x' dominates; source B: uniform-ish
    for i in range(30):
        rows.append((i, "A", "x " * (5 if i % 2 == 0 else 1) + "y z"))
    for i in range(30, 50):
        rows.append((i, "B", "p q r s"))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_cms_overestimates_and_exact_zero_for_absent(spark):
    from mintpy_spark.functions.scalars import nonempty_tokens
    from mintpy_spark.operators.sketch import cms_estimate, cms_tier

    docs = _docs(spark)
    toks = docs.select(
        "source", F.explode(nonempty_tokens(F.col("text"))).alias("tok")
    )
    sk = cms_tier(toks, "tok", key_cols=("source",))
    probes = spark.createDataFrame(
        [("A", "x"), ("A", "nope"), ("B", "p")], "source string, token string"
    )
    est = {
        (r["source"], r["token"]): r["est"]
        for r in cms_estimate(sk, probes, "token", key_cols=("source",)).collect()
    }
    exact = {
        (r["source"], r["tok"]): r["cnt"]
        for r in toks.groupBy("source", "tok").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    assert est[("A", "nope")] == 0
    assert est[("A", "x")] >= exact[("A", "x")]
    assert est[("B", "p")] >= exact[("B", "p")]


def test_cms_merge_equals_direct_build(spark):
    # loss-free mergeability: sum of per-half sketches == whole sketch
    from mintpy_spark.functions.scalars import nonempty_tokens
    from mintpy_spark.operators.sketch import cms_merge, cms_tier

    docs = _docs(spark)
    toks = docs.select(
        "source", F.explode(nonempty_tokens(F.col("text"))).alias("tok")
    )
    whole = cms_tier(toks, "tok", key_cols=("source",))
    h1 = cms_tier(
        docs.where(F.col("doc_id") % 2 == 0).select(
            "source", F.explode(nonempty_tokens(F.col("text"))).alias("tok")
        ),
        "tok", key_cols=("source",),
    )
    h2 = cms_tier(
        docs.where(F.col("doc_id") % 2 == 1).select(
            "source", F.explode(nonempty_tokens(F.col("text"))).alias("tok")
        ),
        "tok", key_cols=("source",),
    )
    merged = cms_merge(h1.unionByName(h2), key_cols=("source",))
    a = {tuple(r) for r in whole.collect()}
    b = {tuple(r) for r in merged.collect()}
    assert a == b


def test_priority_sample_deterministic_and_bounded(spark):
    from mintpy_spark.operators.sampling import priority_sample

    docs = _docs(spark).withColumn("w", F.col("doc_id") % 7 + 1)
    s1 = priority_sample(docs, "w", 4, id_col="doc_id", group_cols=("source",))
    s2 = priority_sample(docs, "w", 4, id_col="doc_id", group_cols=("source",))
    r1 = sorted(tuple(r) for r in s1.collect())
    assert r1 == sorted(tuple(r) for r in s2.collect())
    per = {}
    for r in r1:
        per.setdefault(r[0], []).append(r)
    for src, rows in per.items():
        assert len(rows) == 4
        # est_w >= w for sampled rows (HT adjustment never shrinks)
        for row in rows:
            assert row[4] >= row[2]


def test_priority_sample_small_group_whole_and_exact_weights(spark):
    from mintpy_spark.operators.sampling import priority_sample

    docs = spark.createDataFrame(
        [(1, "A", 10), (2, "A", 20)], "doc_id long, source string, w long"
    )
    rows = priority_sample(
        docs, "w", 5, id_col="doc_id", group_cols=("source",)
    ).collect()
    # group smaller than k: everything sampled, est_w == w exactly
    assert sorted((r["doc_id"], r["est_w"]) for r in rows) == [
        (1, 10.0), (2, 20.0)
    ]


def test_priority_sample_subset_sum_unbiased(spark):
    # Duffield et al.: E[sum of est_w over sample ∩ S] = sum of w over S.
    # Check the total-sum version across many independent salts.
    from mintpy_spark.operators.sampling import priority_sample

    docs = spark.createDataFrame(
        [(i, "A", (i % 5) + 1) for i in range(40)],
        "doc_id long, source string, w long",
    ).cache()
    true_total = 40 * 3.0  # weights 1..5 uniform -> mean 3
    ests = []
    for salt in range(30):
        rows = priority_sample(
            docs, "w", 6, id_col="doc_id", group_cols=("source",),
            salt=str(salt),
        ).collect()
        ests.append(sum(r["est_w"] for r in rows))
    avg = sum(ests) / len(ests)
    assert abs(avg - true_total) / true_total < 0.15


def test_zipf_slope_negative_on_zipfian_counts(spark):
    # a corpus whose token counts follow 1/rank must fit slope ~ -1,
    # measured THROUGH the registered query (not a re-derivation)
    import os
    import tempfile

    from mintpy_spark.queries_sketch2 import text_zipf_slope

    rows = []
    for rank in range(1, 21):
        reps = max(1, round(100 / rank))
        rows.append((rank, "Z", (" tok%02d" % rank) * reps))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = text_zipf_slope(spark, d).collect()
    assert len(out) == 1 and out[0]["source"] == "Z"
    assert out[0]["n_terms"] == 20
    assert -1.15 < out[0]["zipf_slope"] < -0.85
    # cross-check the query's aggregate against a python OLS replica
    pts = []
    cnt_by_rank = sorted(
        (max(1, round(100 / r)) for r in range(1, 21)), reverse=True
    )
    for i, c in enumerate(cnt_by_rank, start=1):
        pts.append((math.log(i), math.log(c)))
    n = len(pts)
    sx = sum(p[0] for p in pts); sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts); sxx = sum(p[0] ** 2 for p in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(out[0]["zipf_slope"] - round(slope, 4)) < 1e-9
