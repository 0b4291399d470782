"""Streaming Holt-Winters: streaming == batch over replayed buckets,
seasonal slots survive restarts, replays are no-ops."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest


SCHEMA = "user_id long, bucket_start timestamp, y double"


@pytest.fixture()
def paths(tmp_path):
    return (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )


def _run(spark, inp, outp, ckpt):
    from mintpy_spark.streaming.holtwinters_stream import (
        streaming_holt_winters,
    )

    src = spark.readStream.schema(SCHEMA).parquet(inp)
    q = (
        streaming_holt_winters(src)
        .writeStream.format("parquet")
        .option("path", outp)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _days(uid, seed, n, start=0):
    rng = np.random.default_rng(seed)
    t0 = dt.datetime(2024, 1, 1)
    # trend + weekly season + noise, so all three state components move
    return [
        (
            uid,
            t0 + dt.timedelta(days=start + i),
            float(100 + 2 * (start + i) + 10 * ((start + i) % 7)
                  + rng.normal(0, 1)),
        )
        for i in range(n)
    ]


def test_streaming_equals_batch_across_restarts(spark, paths):
    from mintpy_spark.operators.holtwinters import holt_winters_additive

    inp, outp, ckpt = paths
    rows1 = _days(1, 41, 16) + _days(2, 42, 9)
    spark.createDataFrame(rows1, SCHEMA).write.mode("append").parquet(inp)
    _run(spark, inp, outp, ckpt)
    # restart: seasonal slots must resume mid-rotation, not re-init
    rows2 = _days(1, 43, 12, start=16) + _days(3, 44, 5)
    spark.createDataFrame(rows2, SCHEMA).write.mode("append").parquet(inp)
    _run(spark, inp, outp, ckpt)

    got = {
        (r["user_id"], r["rn"]): (r["level"], r["trend"], r["seasonal"])
        for r in spark.read.parquet(outp).collect()
    }
    hist = spark.createDataFrame(rows1 + rows2, SCHEMA)
    want = {
        (r["user_id"], r["rn"]): (r["level"], r["trend"], r["seasonal"])
        for r in holt_winters_additive(
            hist, "y", key="user_id", ts="bucket_start"
        ).collect()
    }
    assert got == want  # bit-identical (level, trend, seasonal) per row


def test_replay_is_noop(spark, paths):
    inp, outp, ckpt = paths
    rows = _days(1, 45, 10)
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(inp)
    _run(spark, inp, outp, ckpt)
    n1 = spark.read.parquet(outp).count()
    assert n1 == 10
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(inp)
    _run(spark, inp, outp, ckpt)
    assert spark.read.parquet(outp).count() == n1
