"""Round-3 batch o: inverted index, SCD2 snapshot, cohort retention."""

from __future__ import annotations

import tempfile
from datetime import datetime


def _write_events(spark, rows, td):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{td}/events.parquet")


def test_index_postings_exact(spark):
    from mintpy_spark.queries_behave import index_postings_stats

    docs = spark.createDataFrame(
        [(1, "a b a", "en", "s", 5), (2, "b c", "en", "s", 3),
         (3, "a", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(f"{td}/documents.parquet")
        out = {r["tok"]: r for r in index_postings_stats(spark, td).collect()}
    assert (out["a"]["df"], out["a"]["cf"]) == (2, 3)
    assert (out["b"]["df"], out["b"]["cf"]) == (2, 2)
    assert (out["c"]["df"], out["c"]["cf"]) == (1, 1)
    # same postings set -> same fingerprint; different -> different
    assert out["a"]["postings_fp"] != out["b"]["postings_fp"]


def test_scd2_snapshot_intervals(spark):
    from mintpy_spark.queries_behave import scd2_snapshot

    rows = [
        # user 0: value 2.0 until Jan 20 -> live value 2.0 at Jan 15
        (0, datetime(2024, 1, 10), 0, "view", 2.0, "{}"),
        (1, datetime(2024, 1, 20), 0, "view", 9.0, "{}"),
        # user 1: state starts after the snapshot -> not live at Jan 15
        (2, datetime(2024, 1, 16), 1, "view", 5.0, "{}"),
        # user 2: open row from Jan 1, value 1.25 -> live
        (3, datetime(2024, 1, 1), 2, "view", 1.25, "{}"),
    ]
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, rows, td)
        r = scd2_snapshot(spark, td).collect()[0]
    assert r["scd_rows"] == 4
    assert r["open_rows"] == 3  # one row per user is open
    assert r["snap_users"] == 2
    assert r["snap_value_cents"] == 200 + 125


def test_cohort_retention_counts(spark):
    from mintpy_spark.queries_behave import cohort_retention_weekly

    rows = [
        # user 0 signs up week 0, active weeks 0 and 2
        (0, datetime(2024, 1, 2), 0, "signup", 0.0, "{}"),
        (1, datetime(2024, 1, 16), 0, "click", 0.0, "{}"),
        # user 1 signs up week 2, active week 2 only
        (2, datetime(2024, 1, 17), 1, "signup", 0.0, "{}"),
        # user 2 never signs up -> excluded
        (3, datetime(2024, 1, 3), 2, "click", 0.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, rows, td)
        out = {(r["cohort_week"], r["activity_week"]): r["users"]
               for r in cohort_retention_weekly(spark, td).collect()}
    assert out == {(0, 0): 1, (0, 2): 1, (2, 2): 1}
