"""Round-3 batch l: quality-aware dedup representative selection."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_quality_keeper_beats_min_id(spark):
    """On a chain cluster A~B~C the keeper must be the best-quality
    member (here the one passing all Gopher rules), NOT the min id —
    exercised through the same compose the registered query ships."""
    from mintpy_spark.operators.curation import gopher_flags
    from mintpy_spark.operators.dedup import dedup_components

    good = " ".join(["the", "of", "and"] + ["word"] * 47)  # passes all
    short = "the of tiny"                                  # fails wc
    docs = spark.createDataFrame(
        [(0, short), (1, good), (2, short), (9, short)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2)], "doc_a long, doc_b long"
    )
    comp = dedup_components(docs, pairs, iterations=4)
    flags = gopher_flags(docs).select("doc_id", "pass_all", "n_words")
    j = comp.join(flags, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("pass_all"), F.desc("n_words"), F.asc("doc_id")
    )
    keep = {
        r["component"]: (r["doc_id"], r["n"])
        for r in j.withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("component")))
        .where(F.col("rk") == 1)
        .collect()
    }
    # chain {0,1,2} collapses to component 0; keeper is doc 1 (quality)
    assert keep[0] == (1, 3)
    # singleton keeps itself
    assert keep[9] == (9, 1)
