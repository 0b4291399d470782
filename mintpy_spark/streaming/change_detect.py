"""Stateful streaming page-change detection.

The north-star metric is per-url *page-change velocity*; its streaming
primitive is "emit an event when a url's extracted text length changes
from its last observed value". Batch-side this is a lag window
(operators/diff.temporal_derivative). Stream-side lag needs cross-batch
memory, which Structured Streaming's windowed aggregates cannot express —
this is the custom-stateful-operator seam, implemented with
``applyInPandasWithState``:

* state per url = (last_ts_micros, last_length) — two longs, O(1) per key;
* each micro-batch folds its rows in timestamp order against the state and
  emits one row per CHANGE (first observation counts as a change from
  nothing, delta NULL);
* state survives across micro-batches via the query checkpoint, so an
  ``AvailableNow`` restart continues where it stopped — the streaming twin
  of the checkpoint-table batch resume (plans/pipeline.py).

Scale: state is ~24 B/url (10^9 urls ≈ 24 GB across 1000 executors —
trivial); the shuffle is the same hash(url) clustering every batch stage
uses. Within a micro-batch rows for one url arrive as one group, so the
fold is a tiny pandas loop per group, Arrow-batched, no per-row Python
across the boundary.

Reference analog: the update-mode re-run skip (utils/utils1.py:691
run_or_skip) detects "input changed since last run" at file granularity;
this operator is the same idea at row granularity, as a streaming operator.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text_length", T.LongType()),
        T.StructField("prev_length", T.LongType()),
        T.StructField("delta", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.LongType()),  # microseconds since epoch
        T.StructField("last_len", T.LongType()),
    ]
)


def _detect(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last_ts, last_len = state.get if state.exists else (None, None)
    out: list[tuple[Any, ...]] = []
    # materialize ALL Arrow chunks and sort ONCE: a group larger than the
    # Arrow batch size arrives as several chunks in arbitrary shuffle
    # order, and per-chunk sorting would let the <= last_ts skip silently
    # drop events from a later-sorted earlier chunk
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("warc_ts")
        for ts, ln in zip(pdf["warc_ts"], pdf["text_length"]):
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if last_ts is not None and ts_us <= last_ts:
                continue  # replayed/out-of-order behind state: already folded
            ln = int(ln)
            if last_len is None or ln != last_len:
                prev = last_len
                out.append(
                    (key[0], ts, ln, prev, None if prev is None else ln - prev)
                )
            last_ts, last_len = ts_us, ln
    if last_ts is not None:
        state.update((last_ts, last_len))
    if out:
        yield pd.DataFrame(
            out, columns=["url", "warc_ts", "text_length", "prev_length", "delta"]
        )


def change_events(obs: DataFrame) -> DataFrame:
    """obs(url, warc_ts, text_length) [streaming] -> change events.

    Append-mode stateful map: one output row per observed change per url,
    cross-batch state in the query checkpoint.
    """
    return obs.groupBy("url").applyInPandasWithState(
        _detect,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_change_events(obs: DataFrame) -> DataFrame:
    """The batch twin (lag window) — the cross-check oracle for the
    streaming operator: same rows when the stream is replayed batch-wise."""
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy("warc_ts")
    prev = F.lag("text_length").over(w)
    return (
        obs.withColumn("prev_length", prev)
        .where(F.col("prev_length").isNull() | (F.col("prev_length") != F.col("text_length")))
        .select(
            "url",
            "warc_ts",
            F.col("text_length").cast("long").alias("text_length"),
            F.col("prev_length").cast("long").alias("prev_length"),
            (F.col("text_length") - F.col("prev_length")).cast("long").alias("delta"),
        )
    )
