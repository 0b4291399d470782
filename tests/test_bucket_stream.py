"""Streaming token bucket: exact-integer parity with the batch
simulation across restarts; replay is a no-op."""

from __future__ import annotations

import datetime as dt

import pytest


SCHEMA = "user_id long, ts timestamp"


@pytest.fixture()
def paths(tmp_path):
    return (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )


def _run(spark, inp, outp, ckpt):
    from mintpy_spark.streaming.bucket_stream import streaming_token_bucket

    src = spark.readStream.schema(SCHEMA).parquet(inp)
    q = (
        streaming_token_bucket(src)
        .writeStream.format("parquet")
        .option("path", outp)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_burst_steady_cap_across_restarts(spark, paths):
    inp, outp, ckpt = paths
    t0 = dt.datetime(2024, 1, 1)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # burst of 5 within a minute: 3 admitted from the full bucket (cap 3,
    # 1 token/event), 2 rejected (sub-minute refill is 0 or 16 mt)
    rows1 = [(1, at(i)) for i in range(5)]
    spark.createDataFrame(rows1, SCHEMA).write.mode("append").parquet(inp)
    _run(spark, inp, outp, ckpt)
    got1 = {
        (r["rn"]): (r["admitted"], r["tokens_mt"])
        for r in spark.read.parquet(outp).collect()
    }
    assert [got1[i][0] for i in range(1, 6)] == [True, True, True, False, False]

    # after a restart: 10 h later the bucket is back at cap; steady
    # 1-per-2h events all admit (refill 2000 >= cost 1000)
    rows2 = [(1, at(600 + 120 * i)) for i in range(4)]
    spark.createDataFrame(rows2, SCHEMA).write.mode("append").parquet(inp)
    _run(spark, inp, outp, ckpt)
    got2 = {
        r["rn"]: (r["admitted"], r["tokens_mt"])
        for r in spark.read.parquet(outp).collect()
    }
    assert all(got2[i][0] for i in range(6, 10))
    # bucket saturates at cap between sparse events: level stays capped
    assert got2[6][1] == 2000  # cap 3000 refilled, minus cost

    # full-history cross-check against the batch simulation fold
    def batch(rows):
        ts = sorted(int(t.timestamp() * 1_000_000) for _u, t in rows)
        tokens, admitted, last = 3000 - 1000, 1, ts[0]
        for t in ts[1:]:
            tokens = min(3000, tokens + (t - last) * 1000 // 3_600_000_000)
            if tokens >= 1000:
                tokens -= 1000
                admitted += 1
            last = t
        return admitted, tokens

    adm, tok = batch(rows1 + rows2)
    assert sum(1 for v in got2.values() if v[0]) == adm
    assert got2[max(got2)][1] == tok


def test_replay_is_noop(spark, paths):
    inp, outp, ckpt = paths
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0 + dt.timedelta(hours=2 * i)) for i in range(5)]
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(inp)
    _run(spark, inp, outp, ckpt)
    n1 = spark.read.parquet(outp).count()
    assert n1 == 5
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(inp)
    _run(spark, inp, outp, ckpt)
    assert spark.read.parquet(outp).count() == n1
