"""Round-4 batch a planted truth: deramp-then-RMS recovers a planted ramp
(residual RMS ~ 0 for pure-ramp epochs) and the realtime tier read equals
a batch rebuild when folds are split arbitrarily."""

from __future__ import annotations

import datetime as dt
import os
import tempfile


def _write_events(spark, rows, d):
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string,"
        " value double, props string"
    )
    df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))


def test_residual_rms_deramped_removes_planted_ramp(spark):
    """Epoch 1: value = 3 + 0.5*user_id (pure linear ramp in the key
    coordinate) -> deramp removes it exactly, residual RMS 0. Epoch 2:
    ramp + alternating ±1 noise orthogonal to the ramp -> RMS 1 (the
    deramp must NOT absorb the noise). Mirrors the reference pipeline
    stage timeseries_rms.py:35-72 (deramp before RMS)."""
    from mintpy_spark.queries_tiers import residual_rms_deramped

    t1 = dt.datetime(2024, 7, 1, 12)
    t2 = dt.datetime(2024, 7, 2, 12)
    rows = []
    eid = 0
    for u in range(8):
        rows.append((u, t1, eid, "view", 3.0 + 0.5 * u, None)); eid += 1
    # the (+1,-1,-1,+1) pattern has zero sum AND zero first moment over
    # u = 0..7 (sum u*p = 0-1-2+3+4-5-6+7 = 0), so it is orthogonal to
    # both the constant and the linear term and OLS leaves it untouched
    pattern = (1.0, -1.0, -1.0, 1.0)
    for u in range(8):
        noise = pattern[u % 4]
        rows.append((u, t2, eid, "view", 3.0 + 0.5 * u + noise, None)); eid += 1

    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, rows, d)
        got = {
            r.bucket_start: (r.rms, r.cnt)
            for r in residual_rms_deramped(spark, d).collect()
        }
    assert got[dt.datetime(2024, 7, 1)] == (0.0, 8)
    assert got[dt.datetime(2024, 7, 2)] == (1.0, 8)


def test_tier_realtime_read_check_equals_batch(spark):
    """The query folds two micro-batches into stored tiers and merges an
    unfolded tail at read time; its result must equal one batch GROUP BY
    over everything — checked here over >=3 days so every leg (fold 0,
    incremental fold 1, realtime tail) is non-trivially exercised."""
    import pyspark.sql.functions as F

    from mintpy_spark.queries_tiers import tier_realtime_read_check

    t0 = dt.datetime(2024, 7, 1)
    rows = []
    eid = 0
    for day in range(6):
        for u in (1, 2):
            for h in (3, 15):
                rows.append(
                    (u, t0 + dt.timedelta(days=day, hours=h), eid, "view",
                     float(day * 10 + u + h / 100.0), None)
                )
                eid += 1

    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, rows, d)
        got = tier_realtime_read_check(spark, d)
        ev = spark.read.parquet(os.path.join(d, "events.parquet"))
        want = (
            ev.groupBy(
                "user_id", F.date_trunc("day", "ts").alias("bucket_start")
            )
            .agg(
                F.count("value").alias("cnt"),
                (F.round(F.sum("value"), 2) + F.lit(0.0)).alias("vsum"),
                F.min("value").alias("vmin"),
                F.max("value").alias("vmax"),
            )
        )
        key = lambda r: (r.user_id, r.bucket_start)
        assert sorted(map(tuple, got.collect()), key=lambda t: t[:2]) == sorted(
            map(tuple, want.collect()), key=lambda t: t[:2]
        )
        assert got.count() == 12  # 6 days x 2 users
