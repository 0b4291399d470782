"""Round-3 batch r: snapshot diff, label silhouette, time-weighted median."""

from __future__ import annotations

import tempfile
from datetime import datetime, timedelta


def _write_events(spark, rows, td):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{td}/events.parquet")


def test_tier_snapshot_diff_buckets(spark):
    from mintpy_spark.queries_behave import tier_snapshot_diff

    t0 = datetime(2024, 1, 1)
    rows = [
        (d, t0 + timedelta(days=d), 0, "click", 1.00, "{}") for d in range(10)
    ]
    # late event inside day 8 (8.5d > the 8.1d cutoff) changes that bucket
    rows.append((100, t0 + timedelta(days=8, hours=12), 0, "click", 2.00, "{}"))
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, rows, td)
        out = {r["day"].day: r for r in tier_snapshot_diff(spark, td).collect()}
    d8, d9, d1 = out[9], out[10], out[1]  # .day of Jan dates: day d -> d+1
    assert (d8["buckets_changed"], d8["add_cnt"], d8["add_cents"]) == (1, 1, 200)
    assert (d9["buckets_new"], d9["add_cnt"], d9["add_cents"]) == (1, 1, 100)
    assert (d1["buckets_unchanged"], d1["add_cnt"]) == (1, 0)


def test_embedding_label_silhouette_separation(spark):
    from mintpy_spark.queries_behave import embedding_label_silhouette

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),
        (2, [0.0, 1.0], 1),
        (3, [0.1, 0.9], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/embeddings.parquet")
        out = {r["label"]: r for r in
               embedding_label_silhouette(spark, td).collect()}
    assert set(out) == {0, 1}
    for lbl in (0, 1):
        assert out[lbl]["n_vecs"] == 2
        # tight clusters on orthogonal axes: own-cos near 1e6, other near 0
        assert out[lbl]["separation_q_sum"] > 1_500_000
        assert out[lbl]["own_cos_q_sum"] > out[lbl]["other_cos_q_sum"]


def test_time_weighted_median_durations(spark):
    from mintpy_spark.queries_behave import time_weighted_median

    t0 = datetime(2024, 1, 1)
    rows = [
        (0, t0, 0, "gauge", 1.0, "{}"),
        (1, t0 + timedelta(hours=1), 0, "gauge", 10.0, "{}"),
        (2, t0 + timedelta(hours=3), 0, "gauge", 1.0, "{}"),
        (3, t0 + timedelta(hours=4), 0, "gauge", 99.0, "{}"),  # last: no weight
    ]
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, rows, td)
        r = time_weighted_median(spark, td).collect()[0]
    # segments: v=1 for 1h, v=10 for 2h, v=1 for 1h -> half of 4h total is
    # covered at value 1 (2h cumulative) -> weighted median 1.0
    assert r["tw_median"] == 1.0
    assert r["total_w_us"] == 4 * 3600 * 10**6
    assert r["n_segments"] == 3
