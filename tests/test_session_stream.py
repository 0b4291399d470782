"""Streaming sessionizer: closed sessions == batch sessions minus each
key's open tail, across restarts; NULLs extend but don't count."""

from __future__ import annotations

import datetime as dt

import pytest


SCHEMA = "user_id long, ts timestamp, value double"
GAP = 3600  # 1 hour


@pytest.fixture()
def paths(tmp_path):
    return (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )


def _run(spark, inp, outp, ckpt):
    from mintpy_spark.streaming.session_stream import streaming_sessionize

    src = spark.readStream.schema(SCHEMA).parquet(inp)
    q = (
        streaming_sessionize(src, gap_seconds=GAP)
        .writeStream.format("parquet")
        .option("path", outp)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_sessions_equal_batch_minus_open_tail(spark, paths):
    from mintpy_spark.operators.sessionize import sessionize

    inp, outp, ckpt = paths
    t0 = dt.datetime(2024, 1, 1)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows1 = [
        # user 1, session A: three events incl. a NULL (extends, not counted)
        (1, at(0), 10.0), (1, at(30), None), (1, at(90), 5.0),
        # exactly-gap event MERGES (<= keeps)
        (1, at(150), 2.0),
        # user 2, lone event (stays open until batch 2)
        (2, at(10), 7.0),
    ]
    spark.createDataFrame(rows1, SCHEMA).write.mode("append").parquet(inp)
    _run(spark, inp, outp, ckpt)
    assert spark.read.parquet(outp).count() == 0  # nothing closed yet

    rows2 = [
        # > gap after user 1's last event: closes session A, opens B
        (1, at(150 + 61), 1.0),
        # closes user 2's session, opens another
        (2, at(10 + 2000), 3.0),
        # user 2 again within gap (same open session)
        (2, at(10 + 2030), 4.0),
    ]
    spark.createDataFrame(rows2, SCHEMA).write.mode("append").parquet(inp)
    _run(spark, inp, outp, ckpt)

    got = {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["duration_us"], r["n_events"], r["vsum"]
        )
        for r in spark.read.parquet(outp).collect()
    }
    # closed: user1 session A [0, 150] with 3 counted events sum 17,
    #         user2 session [10, 10] with 1 event sum 7
    assert got == {
        (1, at(0)): (at(150), 150 * 60 * 1_000_000, 3, 17.0),
        (2, at(10)): (at(10), 0, 1, 7.0),
    }

    # cross-check against the batch operator: closed == all minus last
    hist = spark.createDataFrame(rows1 + rows2, SCHEMA)
    batch = sessionize(hist, gap=f"{GAP} seconds").collect()
    by_user: dict = {}
    for r in batch:
        by_user.setdefault(r["user_id"], []).append(r)
    want = {}
    for u, rs in by_user.items():
        rs.sort(key=lambda r: r["session_start"])
        for r in rs[:-1]:  # drop the open tail
            want[(u, r["session_start"])] = (
                r["session_end"], r["duration_us"], r["n_events"], r["vsum"]
            )
    assert got == want


def test_replay_is_noop(spark, paths):
    inp, outp, ckpt = paths
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0 + dt.timedelta(hours=3 * i), float(i)) for i in range(4)]
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(inp)
    _run(spark, inp, outp, ckpt)
    n1 = spark.read.parquet(outp).count()
    assert n1 == 3  # gaps of 3h close each previous session
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(inp)
    _run(spark, inp, outp, ckpt)
    assert spark.read.parquet(outp).count() == n1
