"""Streaming Welford moments: final state == batch over replayed
history across restarts; replay is a no-op."""

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
    from mintpy_spark.streaming.welford_stream import streaming_welford

    src = spark.readStream.schema(SCHEMA).parquet(inp)
    q = (
        streaming_welford(src)
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
        for i, v in enumerate(rng.normal(10, 3, n).round(2))
    ]


def _batch_fold(rows):
    """The documented recursion, replayed directly."""
    by = {}
    for uid, _ts, y in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        if y is None:
            continue
        st = by.get(uid)
        if st is None:
            by[uid] = [1, float(y), 0.0]
        else:
            n2 = st[0] + 1
            delta = y - st[1]
            mean_new = st[1] + delta / float(n2)
            st[2] = st[2] + delta * (y - mean_new)
            st[1] = mean_new
            st[0] = n2
    return {u: tuple(st) for u, st in by.items()}


def test_final_state_matches_batch_across_restarts(spark, paths):
    inp, outp, ckpt = paths
    rows1 = _series(1, 51, 15) + _series(2, 52, 8)
    rows1[4] = (1, rows1[4][1], None)  # NULL skipped like batch
    spark.createDataFrame(rows1, SCHEMA).write.mode("append").parquet(inp)
    _run(spark, inp, outp, ckpt)
    rows2 = _series(1, 53, 7, start=15) + _series(3, 54, 4)
    spark.createDataFrame(rows2, SCHEMA).write.mode("append").parquet(inp)
    _run(spark, inp, outp, ckpt)

    import pandas as pd

    got = (
        spark.read.parquet(outp)
        .toPandas()
        .sort_values(["user_id", "n"])
        .groupby("user_id")
        .last()
    )
    want = _batch_fold(rows1 + rows2)
    assert set(got.index) == set(want)
    for u, (n, mean, m2) in want.items():
        row = got.loc[u]
        assert int(row["n"]) == n
        assert row["mean"] == mean  # bit-identical
        assert row["m2"] == m2


def test_replay_is_noop(spark, paths):
    inp, outp, ckpt = paths
    rows = _series(1, 55, 9)
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(inp)
    _run(spark, inp, outp, ckpt)
    n1 = spark.read.parquet(outp).count()
    assert n1 == 9
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(inp)
    _run(spark, inp, outp, ckpt)
    assert spark.read.parquet(outp).count() == n1
