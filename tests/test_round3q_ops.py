"""Round-3 batch q: SAX motif words, kNN label accuracy, Benford audit."""

from __future__ import annotations

import tempfile
from datetime import datetime, timedelta


def _write_events(spark, rows, td):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{td}/events.parquet")


def test_sax_motif_words_symbols(spark):
    from mintpy_spark.queries_embed import sax_motif_words

    t0 = datetime(2024, 1, 1)
    rows = []
    # user 0: daily means 1,2,3,4 -> z = ±1.3416/±0.4472 -> a,b,c,d
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        rows.append((i, t0 + timedelta(days=i), 0, "click", v, "{}"))
    # user 1: flat 5,5,5 -> disc 0 -> bbb
    for i in range(3):
        rows.append((10 + i, t0 + timedelta(days=i), 1, "click", 5.0, "{}"))
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, rows, td)
        out = {r["word"]: r for r in sax_motif_words(spark, td).collect()}
    assert set(out) == {"abc", "bcd", "bbb"}
    assert out["abc"]["n_occ"] == 1 and out["abc"]["n_users"] == 1
    assert out["bbb"]["n_occ"] == 1 and out["bbb"]["n_users"] == 1


def test_sax_daily_mean_is_paa_frame(spark):
    from mintpy_spark.queries_embed import sax_motif_words

    t0 = datetime(2024, 1, 1)
    # two obs on day 0 averaging to 1.0, then single-obs days 2.0, 3.0,
    # 4.0 -> identical words to the plain 1,2,3,4 series
    rows = [
        (0, t0, 0, "click", 0.5, "{}"),
        (1, t0 + timedelta(hours=1), 0, "click", 1.5, "{}"),
        (2, t0 + timedelta(days=1), 0, "click", 2.0, "{}"),
        (3, t0 + timedelta(days=2), 0, "click", 3.0, "{}"),
        (4, t0 + timedelta(days=3), 0, "click", 4.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, rows, td)
        words = {r["word"] for r in sax_motif_words(spark, td).collect()}
    assert words == {"abc", "bcd"}


def test_knn_label_accuracy_majority(spark):
    from mintpy_spark.queries_embed import knn_label_accuracy

    # probes 0 (label 1, near +x) and 1 (label 2, near +y); candidates:
    # three label-1 vectors at +x, three label-2 at +y, and label-9
    # noise at -x. Each probe's top-5 holds 3 of its own label and 2 of
    # the other -> both classify correctly 3-2.
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.0, 1.0], 2),
        (12, [0.9, 0.1], 1),
        (13, [0.8, 0.0], 1),
        (14, [1.0, 0.1], 1),
        (15, [0.1, 0.9], 2),
        (16, [0.0, 0.8], 2),
        (17, [-1.0, 0.0], 9),
        (18, [0.05, 0.95], 2),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/embeddings.parquet")
        out = {r["probe_id"]: r for r in knn_label_accuracy(spark, td).collect()}
    assert out[0]["pred_label"] == 1 and out[0]["correct"] == 1
    assert out[0]["votes"] == 3
    assert out[1]["pred_label"] == 2 and out[1]["correct"] == 1


def test_benford_first_digit_extraction(spark):
    from mintpy_spark.queries_embed import benford_first_digit

    t0 = datetime(2024, 1, 1)
    vals = [1.00, 19.99, 0.05, 2.50, -1.11, 0.0, None]
    rows = [
        (i, t0, 0, "click", v, "{}") for i, v in enumerate(vals)
    ]
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, rows, td)
        out = {r["digit"]: r for r in benford_first_digit(spark, td).collect()}
    # digits: 1.00->100->1, 19.99->1999->1, 0.05->5->5, 2.50->250->2,
    # -1.11->111->1; 0.0 and NULL dropped
    assert out[1]["cnt"] == 3 and out[2]["cnt"] == 1 and out[5]["cnt"] == 1
    assert abs(out[1]["obs_pct"] - 0.6) < 1e-12
    import math

    assert abs(out[1]["exp_pct"] - math.log10(2.0)) < 1e-12
