"""Streaming Kalman filter: streaming == batch over replayed history,
state survives restarts, replays are no-ops."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest


SCHEMA = "user_id long, ts timestamp, value double"


@pytest.fixture()
def paths(tmp_path):
    return (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )


def _run(spark, inp, outp, ckpt):
    from mintpy_spark.streaming.kalman_stream import streaming_kalman_level

    src = spark.readStream.schema(SCHEMA).parquet(inp)
    q = (
        streaming_kalman_level(src)
        .writeStream.format("parquet")
        .option("path", outp)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _series(uid, seed, n, start=0):
    rng = np.random.default_rng(seed)
    t0 = dt.datetime(2024, 1, 1)
    return [
        (uid, t0 + dt.timedelta(hours=start + i), float(v))
        for i, v in enumerate(rng.normal(50, 5, n).round(2))
    ]


def test_streaming_equals_batch_across_restarts(spark, paths):
    from mintpy_spark.operators.kalman import kalman_level

    inp, outp, ckpt = paths
    rows1 = _series(1, 5, 20) + _series(2, 6, 15)
    rows1[3] = (1, rows1[3][1], None)  # NULL obs carries no update
    spark.createDataFrame(rows1, SCHEMA).write.mode("append").parquet(inp)
    _run(spark, inp, outp, ckpt)
    # continuation batch after a RESTART: state must resume, not re-init
    rows2 = _series(1, 7, 10, start=20) + _series(3, 8, 5)
    spark.createDataFrame(rows2, SCHEMA).write.mode("append").parquet(inp)
    _run(spark, inp, outp, ckpt)

    got = {
        (r["user_id"], r["rn"]): r["level"]
        for r in spark.read.parquet(outp).collect()
    }
    hist = spark.createDataFrame(rows1 + rows2, SCHEMA)
    want = {
        (r["user_id"], r["rn"]): r["level"]
        for r in kalman_level(hist, "value", key="user_id", ts="ts").collect()
    }
    assert got == want  # bit-identical levels, every key, every rn


def test_replay_is_noop(spark, paths):
    inp, outp, ckpt = paths
    rows = _series(1, 9, 12)
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(inp)
    _run(spark, inp, outp, ckpt)
    n1 = spark.read.parquet(outp).count()
    # redeliver the SAME rows (new files, old timestamps): all skipped
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(inp)
    _run(spark, inp, outp, ckpt)
    assert spark.read.parquet(outp).count() == n1


def test_filter_job_incremental(spark, tmp_path, capsys):
    """jobs/filter_job.py: two invocations consume only new files; the
    accumulated output equals the batch filter over everything."""
    import json

    from jobs.filter_job import main as filter_main

    from mintpy_spark.operators.kalman import kalman_level

    inp = str(tmp_path / "obs")
    outp = str(tmp_path / "levels")
    ckpt = str(tmp_path / "ck")
    args = [
        "--input", inp, "--output", outp, "--checkpoint", ckpt,
        "--value-col", "value", "--key", "user_id", "--ts", "ts",
        "--schema", SCHEMA,
    ]
    rows1 = _series(1, 31, 10)
    spark.createDataFrame(rows1, SCHEMA).write.mode("append").parquet(inp)
    filter_main(args)
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["levels"] == 10

    rows2 = _series(1, 32, 6, start=10) + _series(2, 33, 4)
    spark.createDataFrame(rows2, SCHEMA).write.mode("append").parquet(inp)
    filter_main(args)
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["levels"] == 20

    got = {
        (r["user_id"], r["rn"]): r["level"]
        for r in spark.read.parquet(outp).collect()
    }
    hist = spark.createDataFrame(rows1 + rows2, SCHEMA)
    want = {
        (r["user_id"], r["rn"]): r["level"]
        for r in kalman_level(hist, "value", key="user_id", ts="ts").collect()
    }
    assert got == want


def test_nan_values_match_batch_semantics(spark, tmp_path):
    """A NaN VALUE is non-null: the batch filter's where-clause keeps it
    and the recursion poisons subsequent levels to NaN. The stream must
    reproduce that (NULL, by contrast, is skipped by both)."""
    import math

    from mintpy_spark.operators.kalman import kalman_level
    from mintpy_spark.streaming.kalman_stream import streaming_kalman_level

    inp = str(tmp_path / "in")
    outp = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1.0),
        (1, t0 + dt.timedelta(hours=1), float("nan")),
        (1, t0 + dt.timedelta(hours=2), 2.0),
        (2, t0, None),
        (2, t0 + dt.timedelta(hours=1), 5.0),
    ]
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(inp)
    src = spark.readStream.schema(SCHEMA).parquet(inp)
    q = (
        streaming_kalman_level(src)
        .writeStream.format("parquet")
        .option("path", outp)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["rn"]): r["level"]
        for r in spark.read.parquet(outp).collect()
    }
    want = {
        (r["user_id"], r["rn"]): r["level"]
        for r in kalman_level(
            spark.createDataFrame(rows, SCHEMA), "value",
            key="user_id", ts="ts",
        ).collect()
    }
    assert set(got) == set(want)

    def same(a, b):
        if a is None or b is None:
            return a is b
        return a == b or (math.isnan(a) and math.isnan(b))

    for k in want:
        assert same(got[k], want[k]), (k, got[k], want[k])
    # key 1: NaN at rn=2 poisons rn>=2 (NaN surfaces as NULL through the
    # Arrow boundary in BOTH paths — identically); key 2: NULL skipped
    assert got[(1, 1)] == 1.0
    assert got[(1, 2)] is None and got[(1, 3)] is None
    assert want[(1, 2)] is None and want[(1, 3)] is None
    assert got[(2, 1)] == 5.0 and (2, 2) not in got
