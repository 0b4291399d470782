"""Streaming tier refresh: incremental, watermark-finalized, and exactly
consistent with the batch rollup for every emitted bucket."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mintpy_spark.streaming.rollup_stream import refresh_tier_1h


def _rows(day: int, hours: range, url: str = "u1"):
    out = []
    for h in hours:
        ts = dt.datetime(2023, 1, day, h, 30)
        out.append((url, ts, b"<body>x</body>", "x" * (10 + h), "en"))
    return out


SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


@pytest.fixture()
def paths(tmp_path):
    return (
        str(tmp_path / "pages_in"),
        str(tmp_path / "tier_out"),
        str(tmp_path / "ckpt"),
    )


def test_streaming_matches_batch_and_is_incremental(spark, paths):
    inp, outp, ckpt = paths
    # batch 1: hours 0..9 of day 1
    spark.createDataFrame(_rows(1, range(0, 10)), SCHEMA).write.mode(
        "append"
    ).parquet(inp)
    refresh_tier_1h(spark, inp, outp, ckpt, watermark="2 hours")
    got1 = spark.read.parquet(outp)
    n1 = got1.count()
    # watermark = max(09:30) - 2h -> buckets strictly before 07:00 finalized
    assert 0 < n1 <= 8
    assert got1.agg(F.max("bucket_start")).first()[0] < dt.datetime(2023, 1, 1, 8)

    # batch 2: a later day arrives -> watermark jumps, day-1 buckets flush
    spark.createDataFrame(_rows(2, range(0, 3)), SCHEMA).write.mode(
        "append"
    ).parquet(inp)
    refresh_tier_1h(spark, inp, outp, ckpt, watermark="2 hours")
    got2 = spark.read.parquet(outp)
    assert got2.count() > n1  # incremental progress, no reprocessing crash

    # every emitted bucket equals the batch rollup of the same input
    batch = (
        spark.read.parquet(inp)
        .groupBy("url", F.date_trunc("hour", "warc_ts").alias("bucket_start"))
        .agg(
            F.count("text").alias("cnt"),
            F.sum(F.octet_length("text")).alias("vsum"),
            F.min(F.octet_length("text")).alias("vmin"),
            F.max(F.octet_length("text")).alias("vmax"),
        )
    )
    joined = got2.alias("s").join(
        batch.alias("b"), ["url", "bucket_start"], "left"
    )
    assert joined.where(F.col("b.cnt").isNull()).count() == 0
    mism = joined.where(
        (F.col("s.cnt") != F.col("b.cnt"))
        | (F.col("s.vsum") != F.col("b.vsum"))
        | (F.col("s.vmin") != F.col("b.vmin"))
        | (F.col("s.vmax") != F.col("b.vmax"))
    ).count()
    assert mism == 0
    # no bucket emitted twice
    assert (
        got2.groupBy("url", "bucket_start").count().where("count > 1").count() == 0
    )


def _run_changes(spark, inp, outp, ckpt):
    from mintpy_spark.streaming.change_detect import change_events

    src = (
        spark.readStream.schema("url string, warc_ts timestamp, text_length long")
        .parquet(inp)
    )
    q = (
        change_events(src)
        .writeStream.format("parquet")
        .option("path", outp)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stateful_change_detector_matches_batch_twin(spark, paths):
    inp, outp, ckpt = paths
    obs1 = [
        ("u1", dt.datetime(2023, 1, 1, 0), 10),
        ("u1", dt.datetime(2023, 1, 1, 1), 10),   # unchanged -> no event
        ("u1", dt.datetime(2023, 1, 1, 2), 15),   # change
        ("u2", dt.datetime(2023, 1, 1, 0), 7),
    ]
    sch = "url string, warc_ts timestamp, text_length long"
    spark.createDataFrame(obs1, sch).write.mode("append").parquet(inp)
    _run_changes(spark, inp, outp, ckpt)
    got1 = spark.read.parquet(outp)
    assert got1.count() == 3  # u1 first-seen, u1 change, u2 first-seen

    # batch 2: state must carry across restarts — u1 repeating 15 is NOT a
    # change; u2 changing is; a brand-new url is first-seen
    obs2 = [
        ("u1", dt.datetime(2023, 1, 2, 0), 15),   # same as state -> no event
        ("u2", dt.datetime(2023, 1, 2, 0), 9),    # change
        ("u3", dt.datetime(2023, 1, 2, 0), 3),    # first seen
    ]
    spark.createDataFrame(obs2, sch).write.mode("append").parquet(inp)
    _run_changes(spark, inp, outp, ckpt)
    got2 = spark.read.parquet(outp)
    assert got2.count() == 5

    # cross-check: streamed events == batch lag-window twin over all input
    from mintpy_spark.streaming.change_detect import batch_change_events

    batch = batch_change_events(spark.read.parquet(inp))
    s = {tuple(r) for r in got2.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b
    # delta semantics
    deltas = {(r.url, r.delta) for r in got2.collect()}
    assert ("u1", 5) in deltas and ("u2", 2) in deltas
    assert ("u3", None) in deltas


def test_change_detector_survives_multi_chunk_groups(spark, paths):
    """A group larger than the Arrow batch arrives as several chunks in
    arbitrary order; the fold must concat+sort once, not per chunk."""
    inp, outp, ckpt = paths
    sch = "url string, warc_ts timestamp, text_length long"
    rows = [
        ("u1", dt.datetime(2023, 1, 1, h), 10 + (h % 3)) for h in range(24)
    ]
    spark.createDataFrame(rows, sch).write.mode("append").parquet(inp)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        _run_changes(spark, inp, outp, ckpt)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    from mintpy_spark.streaming.change_detect import batch_change_events

    got = {tuple(r) for r in spark.read.parquet(outp).collect()}
    expect = {tuple(r) for r in batch_change_events(spark.read.parquet(inp)).collect()}
    assert got == expect and len(got) == 24  # value changes every hour


def test_streaming_tier_maintenance_equals_batch_rebuild(spark, paths):
    """Two AvailableNow maintenance passes (bootstrap + late fold) leave
    stored tiers equal to a from-scratch batch build over all input."""
    import pandas as pd

    from mintpy_spark.operators.rollup import build_tiers
    from mintpy_spark.streaming.tier_maintenance import TierMaintainer, maintain_tiers

    inp, store_root, ckpt = paths
    sch = "url string, warc_ts timestamp, text_length long"

    def drop(day_lo, day_hi):
        rows = [
            (f"u{u}", dt.datetime(2023, 1, d, h), 100 + u * 10 + h)
            for u in range(4)
            for d in range(day_lo, day_hi)
            for h in (3, 9, 15)
        ]
        spark.createDataFrame(rows, sch).write.mode("append").parquet(inp)

    drop(1, 4)
    maintain_tiers(spark, inp, store_root, ckpt)
    drop(4, 6)   # new days
    drop(1, 2)   # AND late rows for day 1 (duplicate obs are new points)
    maintain_tiers(spark, inp, store_root, ckpt)

    m = TierMaintainer(store_root)
    full = build_tiers(spark.read.parquet(inp), "text_length")
    for t in ("1h", "1d", "30d"):
        got = m.read_tier(spark, t)
        want = full[t]
        j = got.alias("g").join(want.alias("w"), ["url", "bucket_start"], "full")
        assert j.where(F.col("g.cnt").isNull() | F.col("w.cnt").isNull()).count() == 0, t
        bad = j.where(
            (F.col("g.cnt") != F.col("w.cnt"))
            | (F.col("g.vmin") != F.col("w.vmin"))
            | (F.col("g.vmax") != F.col("w.vmax"))
            | (F.abs(F.col("g.vsum") - F.col("w.vsum")) > 1e-6)
        ).count()
        assert bad == 0, t


def test_tier_maintenance_replay_is_idempotent(spark, paths):
    """foreachBatch is at-least-once: re-applying an already-committed
    batch must be a no-op (the crash-replay window), and a crashed batch
    (tiers written, marker missing) must recompute cleanly."""
    inp, store_root, ckpt = paths
    sch = "url string, warc_ts timestamp, text_length long"
    rows = [("u1", dt.datetime(2023, 1, 1, h), 10 + h) for h in range(6)]
    delta = spark.createDataFrame(rows, sch)

    from mintpy_spark.streaming.tier_maintenance import TierMaintainer

    m = TierMaintainer(store_root)
    m.apply_delta(delta, batch_id=0)
    before = {t: m.read_tier(spark, t).collect() for t in m.tiers}
    # replay of the committed batch: must not double-fold
    m.apply_delta(delta, batch_id=0)
    after = {t: m.read_tier(spark, t).collect() for t in m.tiers}
    assert {t: sorted(map(tuple, v)) for t, v in before.items()} == {
        t: sorted(map(tuple, v)) for t, v in after.items()
    }
    # simulate a crashed batch 1: version dir written, no marker -> the
    # committed version stays 0 and a replay recomputes from it
    delta2 = spark.createDataFrame(
        [("u1", dt.datetime(2023, 1, 2, h), 50 + h) for h in range(3)], sch
    )
    assert m.committed_version(spark) == 0
    m.apply_delta(delta2, batch_id=1)
    assert m.committed_version(spark) == 1
    total = m.read_tier(spark, "1h").agg(F.sum("cnt")).first()[0]
    assert total == 9  # 6 + 3, no double counting anywhere


def test_read_realtime_and_time_travel(spark, paths):
    """read_realtime(committed tiers + unfolded tail) equals a batch
    rebuild over everything; read_tier(version=...) time-travels to the
    retained prior snapshot; unknown versions raise."""
    import pytest

    from mintpy_spark.operators.rollup import build_tiers
    from mintpy_spark.streaming.tier_maintenance import TierMaintainer

    inp, store_root, ckpt = paths
    sch = "url string, warc_ts timestamp, text_length long"
    batch0 = spark.createDataFrame(
        [
            (f"u{u}", dt.datetime(2023, 1, d, h), 100 + u * 10 + h)
            for u in range(3)
            for d in (1, 2)
            for h in (4, 16)
        ],
        sch,
    )
    tail = spark.createDataFrame(
        [
            ("u0", dt.datetime(2023, 1, 2, 16, 30), 999),  # updates a live bucket
            ("u9", dt.datetime(2023, 1, 3, 5), 7),          # brand-new key/day
        ],
        sch,
    )
    m = TierMaintainer(store_root)
    m.apply_delta(batch0, batch_id=0)

    for t in m.tiers:
        rt = m.read_realtime(spark, t, tail)
        want = build_tiers(batch0.unionByName(tail), "text_length")[t]
        j = rt.alias("g").join(want.alias("w"), ["url", "bucket_start"], "full")
        assert j.where(F.col("g.cnt").isNull() | F.col("w.cnt").isNull()).count() == 0
        bad = j.where(
            (F.col("g.cnt") != F.col("w.cnt"))
            | (F.col("g.vmin") != F.col("w.vmin"))
            | (F.col("g.vmax") != F.col("w.vmax"))
            | (F.abs(F.col("g.vsum") - F.col("w.vsum")) > 1e-6)
        ).count()
        assert bad == 0, t

    # fold the tail as batch 1, then time-travel back to version 0
    m.apply_delta(tail, batch_id=1)
    assert m.versions(spark) == [0, 1]
    v0 = m.read_tier(spark, "1h", version=0)
    assert v0.where(F.col("url") == "u9").count() == 0
    assert m.read_tier(spark, "1h").where(F.col("url") == "u9").count() == 1
    with pytest.raises(FileNotFoundError):
        m.read_tier(spark, "1h", version=77)


def test_query_job_routes_store_plus_tail(spark, paths, tmp_path, capsys):
    """jobs/query_job.py: tiered range query over a maintained store plus
    an unfolded tail equals direct aggregation over all observations in
    the range."""
    import json

    from jobs.query_job import main as query_main
    from mintpy_spark.streaming.tier_maintenance import TierMaintainer

    inp, store_root, ckpt = paths
    sch = "url string, warc_ts timestamp, text_length double"
    folded = spark.createDataFrame(
        [
            (f"u{u}", dt.datetime(2023, 1, d, h, 20), float(10 * u + d + h))
            for u in range(3)
            for d in range(1, 9)
            for h in (2, 8, 14, 20)
        ],
        sch,
    )
    tail_rows = [
        ("u0", dt.datetime(2023, 1, 5, 9, 5), 500.0),   # tier interior
        ("u7", dt.datetime(2023, 1, 2, 3, 40), 700.0),  # new key, fringe-ish
    ]
    tail = spark.createDataFrame(tail_rows, sch)
    m = TierMaintainer(store_root)
    m.apply_delta(folded, batch_id=0)
    tail_dir = str(tmp_path / "tail")
    tail.write.parquet(tail_dir)

    t0, t1 = "2023-01-02 03:30:00", "2023-01-08 14:10:00"
    out_dir = str(tmp_path / "result")
    query_main([
        "--store", store_root, "--from", t0, "--to", t1,
        "--tail", tail_dir, "--output", out_dir,
    ])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    everything = folded.unionByName(tail)
    want = (
        everything.where(
            (F.col("warc_ts") >= F.lit(t0).cast("timestamp"))
            & (F.col("warc_ts") < F.lit(t1).cast("timestamp"))
        )
        .groupBy("url")
        .agg(
            F.count("text_length").alias("cnt"),
            F.sum("text_length").alias("vsum"),
            F.min("text_length").alias("vmin"),
            F.max("text_length").alias("vmax"),
        )
    )
    got = spark.read.parquet(out_dir)
    w = {r["url"]: r for r in want.collect()}
    g = {r["url"]: r for r in got.collect()}
    assert set(w) == set(g) and "u7" in g
    for k in w:
        assert g[k]["cnt"] == w[k]["cnt"], k
        assert g[k]["vmin"] == w[k]["vmin"] and g[k]["vmax"] == w[k]["vmax"], k
        assert abs(g[k]["vsum"] - w[k]["vsum"]) < 1e-6, k
    assert rep["n_keys"] == len(w)
    assert rep["total_obs"] == sum(r["cnt"] for r in w.values())


def test_compact_raw_drops_covered_history_only(spark, paths):
    """Downsample-then-delete lifecycle: raw below an aligned cutoff is
    deleted once the committed 1h tier accounts for it; routed range
    queries over the compacted store still answer exactly; misaligned
    cutoffs and un-folded late data are refused."""
    import pytest

    from mintpy_spark.operators.retention import compact_raw
    from mintpy_spark.operators.rollup import route_range_agg
    from mintpy_spark.streaming.tier_maintenance import TierMaintainer

    inp, store_root, _ = paths
    sch = "url string, warc_ts timestamp, text_length long"
    rows = [
        (f"u{u}", dt.datetime(2023, 1, d, h, 30), 100 + u * 10 + d + h)
        for u in range(3)
        for d in range(1, 8)
        for h in (3, 9, 15)
    ]
    spark.createDataFrame(rows, sch).write.mode("overwrite").parquet(inp)

    m = TierMaintainer(store_root)
    m.apply_delta(spark.read.parquet(inp), batch_id=0)

    t0, t1 = "2023-01-01 00:00:00", "2023-01-08 00:00:00"

    def routed():
        tiers = {t: m.read_tier(spark, t) for t in ("1h", "1d")}
        out = route_range_agg(
            spark.read.parquet(inp), tiers, t0, t1, "text_length"
        )
        return {r.url: (r.cnt, r.vsum, r.vmin, r.vmax) for r in out.collect()}

    before = routed()

    with pytest.raises(ValueError):  # misaligned cutoff
        compact_raw(spark, inp, "2023-01-04 00:30:00", m, tier="1h")

    res = compact_raw(spark, inp, "2023-01-04 00:00:00", m, tier="1h")
    assert res["dropped"] == 3 * 3 * 3 and res["kept"] == 3 * 4 * 3

    left = spark.read.parquet(inp)
    assert left.where(F.col("warc_ts") < "2023-01-04").count() == 0
    assert routed() == before  # tier-covered history still answers exactly

    # late data below the new horizon that was never folded: refused
    late = spark.createDataFrame(
        [("u0", dt.datetime(2023, 1, 5, 4, 30), 7)], sch
    )
    late.write.mode("append").parquet(inp)
    with pytest.raises(RuntimeError):
        compact_raw(spark, inp, "2023-01-06 00:00:00", m, tier="1h")
    # fold it, then the same compaction goes through
    m.apply_delta(late, batch_id=1)
    res2 = compact_raw(spark, inp, "2023-01-06 00:00:00", m, tier="1h")
    assert res2["dropped"] == 3 * 2 * 3 + 1


def test_compact_raw_late_row_in_compacted_bucket(spark, paths):
    """A late row that lands in an ALREADY-compacted bucket: refused while
    unfolded (ledger + raw > tier), dropped cleanly once folded (the
    ledger is what makes this exact — tier == ledger + raw again)."""
    import pytest

    from mintpy_spark.operators.retention import compact_raw
    from mintpy_spark.streaming.tier_maintenance import TierMaintainer

    inp, store_root, _ = paths
    sch = "url string, warc_ts timestamp, text_length long"
    rows = [
        ("u0", dt.datetime(2023, 2, d, h), 10 * d + h)
        for d in range(1, 5)
        for h in (6, 18)
    ]
    spark.createDataFrame(rows, sch).write.mode("overwrite").parquet(inp)
    m = TierMaintainer(store_root)
    m.apply_delta(spark.read.parquet(inp), batch_id=0)
    compact_raw(spark, inp, "2023-02-03 00:00:00", m, tier="1h")

    # late arrival INTO the compacted span (day 1)
    late = spark.createDataFrame([("u0", dt.datetime(2023, 2, 1, 6), 99)], sch)
    late.write.mode("append").parquet(inp)
    with pytest.raises(RuntimeError):
        compact_raw(spark, inp, "2023-02-04 00:00:00", m, tier="1h")
    m.apply_delta(late, batch_id=1)
    res = compact_raw(spark, inp, "2023-02-04 00:00:00", m, tier="1h")
    # drops day 3 (2 rows) + the folded late day-1 row
    assert res["dropped"] == 3
    assert spark.read.parquet(inp).where(F.col("warc_ts") < "2023-02-04").count() == 0


def test_dedup_index_stream_equals_batch(spark, tmp_path):
    """Streaming MinHash-LSH index: pairs emitted across batches must
    equal the one-shot batch operator over everything ingested, each
    pair exactly once; replays of committed batches are no-ops."""
    from mintpy_spark.operators.dedup import minhash_near_dups
    from mintpy_spark.streaming.dedup_stream import DedupIndexMaintainer

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    b1 = docs.where(F.col("doc_id") % 3 == 0)
    b2 = docs.where(F.col("doc_id") % 3 == 1)
    b3 = docs.where(F.col("doc_id") % 3 == 2)

    m = DedupIndexMaintainer(str(tmp_path / "dedup_idx"), threshold=0.5)
    m.apply_batch(b1, 0)
    m.apply_batch(b2, 1)
    m.apply_batch(b3, 2)

    got = {
        (r.doc_a, r.doc_b, round(r.est_jaccard, 9))
        for r in m.emitted_pairs(spark).collect()
    }
    want = {
        (r.doc_a, r.doc_b, round(r.est_jaccard, 9))
        for r in minhash_near_dups(docs, threshold=0.5).collect()
    }
    assert got == want and len(got) > 0
    # exactly-once: no pair twice across batches
    total = m.emitted_pairs(spark).count()
    assert total == m.emitted_pairs(spark).select("doc_a", "doc_b").distinct().count()

    # replay of a committed batch: skipped, store unchanged
    assert m.apply_batch(b2, 1) is None
    assert m.emitted_pairs(spark).count() == total
    assert m.committed_batches(spark) == [0, 1, 2]


def test_compact_raw_keeps_null_ts_rows(spark, paths):
    """Review fix: a NULL-timestamp row belongs to no bucket and can never
    be tier-covered — compaction must keep it (a bare ts >= cut filter
    would silently drop it, unledgered)."""
    from mintpy_spark.operators.retention import compact_raw
    from mintpy_spark.streaming.tier_maintenance import TierMaintainer

    inp, store_root, _ = paths
    sch = "url string, warc_ts timestamp, text_length long"
    rows = [
        ("u0", dt.datetime(2023, 1, d, h, 30), 10 + d + h)
        for d in range(1, 5)
        for h in (3, 9)
    ]
    spark.createDataFrame(rows, sch).write.mode("overwrite").parquet(inp)
    spark.createDataFrame([("bad", None, 99)], sch).write.mode("append").parquet(inp)

    m = TierMaintainer(store_root)
    # fold only the timestamped rows (NULL ts has no bucket to fold into)
    m.apply_delta(spark.read.parquet(inp).where(F.col("warc_ts").isNotNull()), 0)
    res = compact_raw(spark, inp, "2023-01-03 00:00:00", m, tier="1h")
    left = spark.read.parquet(inp)
    assert res["dropped"] == 2 * 2
    assert left.where(F.col("warc_ts").isNull()).count() == 1  # survived
    assert left.count() == 2 * 2 + 1


def test_committed_version_ignores_stray_commit_entries(spark, paths):
    """Review fix: a non-numeric v* file in _commits (rename artifact,
    v6.bak) must not crash every read/fold."""
    import os

    from mintpy_spark.streaming.tier_maintenance import TierMaintainer

    inp, store_root, _ = paths
    sch = "url string, warc_ts timestamp, text_length long"
    spark.createDataFrame(
        [("u", dt.datetime(2023, 1, 1, 1, 30), 10)], sch
    ).write.mode("overwrite").parquet(inp)
    m = TierMaintainer(store_root)
    m.apply_delta(spark.read.parquet(inp), batch_id=0)
    open(os.path.join(store_root, "_commits", "v6.bak"), "w").write("")
    assert m.committed_version(spark) == 0
    assert m.versions(spark) == [0]
    assert m.read_tier(spark, "1h").count() == 1


def test_read_realtime_on_variance_capable_store(spark, paths):
    """Review fix: the realtime tail must carry vsumsq when the stored
    tier does (union previously failed on the missing column)."""
    from mintpy_spark.operators.rollup import rollup_from_obs
    from mintpy_spark.streaming.tier_maintenance import TierMaintainer

    inp, store_root, _ = paths
    sch = "url string, warc_ts timestamp, text_length long"
    base = [("u", dt.datetime(2023, 1, 1, 1, 10), 10),
            ("u", dt.datetime(2023, 1, 1, 1, 40), 30)]
    spark.createDataFrame(base, sch).write.mode("overwrite").parquet(inp)
    m = TierMaintainer(store_root)
    m.apply_delta(spark.read.parquet(inp), batch_id=0, with_sq=True)

    tail = spark.createDataFrame(
        [("u", dt.datetime(2023, 1, 1, 1, 50), 50)], sch
    )
    rt = m.read_realtime(spark, "1h", tail).collect()[0]
    assert rt.cnt == 3 and rt.vsum == 90.0
    assert rt.vsumsq == 100.0 + 900.0 + 2500.0


def test_checkpoint_table_refuses_remote_roots():
    import pytest

    from mintpy_spark.plans.checkpoint import CheckpointTable

    with pytest.raises(NotImplementedError, match="remote root"):
        CheckpointTable("s3a://bucket/tiers/_maintenance_metrics")


def test_hdr_sketch_maintenance_equals_batch_and_replay_safe(spark, paths):
    """Streamed HDR sketch folds must equal hdr_tier over everything
    ingested, and — critically for an ADDITIVE sketch — a replayed
    committed batch must not double-count."""
    from mintpy_spark.operators.sketch import hdr_tier
    from mintpy_spark.streaming.sketch_stream import (
        HdrSketchMaintainer, maintain_hdr_sketch,
    )

    inp, store_root, ckpt = paths
    sch = "url string, warc_ts timestamp, text_length long"

    def drop(day_lo, day_hi):
        rows = [
            (f"u{u}", dt.datetime(2023, 2, d, h), 90 + u * 13 + h * 7)
            for u in range(3)
            for d in range(day_lo, day_hi)
            for h in (2, 8, 14, 20)
        ]
        spark.createDataFrame(rows, sch).write.mode("append").parquet(inp)

    drop(1, 3)
    maintain_hdr_sketch(spark, inp, store_root, ckpt)
    drop(3, 5)  # new days
    drop(1, 2)  # late rows for day 1
    maintain_hdr_sketch(spark, inp, store_root, ckpt)

    m = HdrSketchMaintainer(store_root)
    got = {tuple(r) for r in m.read_sketch(spark).collect()}
    allobs = spark.read.parquet(inp).select(
        F.date_trunc("day", F.col("warc_ts")).alias("day"),
        F.col("text_length").cast("long").alias("_v"),
    )
    want = {tuple(r) for r in hdr_tier(allobs, "_v", key_cols=("day",)).collect()}
    assert got == want

    # replay of an already-committed batch: counters must NOT double
    delta = spark.createDataFrame(
        [("u9", dt.datetime(2023, 2, 1, 5), 111)], sch
    )
    last = m.committed_version(spark)
    m.apply_delta(delta, batch_id=last)  # same id -> skipped
    assert {tuple(r) for r in m.read_sketch(spark).collect()} == got
    m.apply_delta(delta, batch_id=last + 1)  # new id -> folds once
    total = m.read_sketch(spark).agg(F.sum("cnt")).first()[0]
    assert total == spark.read.parquet(inp).count() + 1
