"""Stateful streaming rolling z-score anomaly monitor.

The streaming twin of ``operators/anomaly.rolling_zscore_anomalies``:
each key keeps the trailing ``lookback`` quantized observations as O(1)
state and scores every arriving point against them with the SAME exact
int64 decision boundary, so a replayed stream emits byte-for-byte the
rows the batch operator computes over the full history —
streaming == batch is the correctness oracle (test_streaming.py).

State per key = (last_ts_micros, ring buffer of ≤ lookback quantized
values; NULL slots preserved so the ROWS-frame semantics of the batch
window — physical positions, null-skipping aggregates — are reproduced
exactly). At 10^9 keys and lookback 12 the state is ~100 B/key ≈ 100 GB
across 1000 executors; the shuffle is the usual hash(key) clustering.
Rows at-or-behind the state watermark are skipped (at-least-once replay
safe), matching streaming/change_detect.py.

Reference analog: timeseries_rms.py:34-120 flags outlier epochs offline;
this is the online per-observation monitor a crawl pipeline runs to page
an operator when a url's text length jumps (template change/defacement).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _schemas(
    key_name: str,
    key_type: T.DataType,
    ts_name: str,
    ts_type: T.DataType,
    value_name: str = "value",
):
    out = T.StructType(
        [
            T.StructField(key_name, key_type),
            T.StructField(ts_name, ts_type),
            T.StructField(value_name, T.DoubleType()),
            T.StructField("n", T.LongType()),
            T.StructField("dev", T.LongType()),
            T.StructField("z", T.DoubleType()),
        ]
    )
    state = T.StructType(
        [
            T.StructField("last_ts", T.LongType()),
            T.StructField("vals", T.ArrayType(T.LongType(), containsNull=True)),
        ]
    )
    return out, state


def streaming_zscore_anomalies(
    obs: DataFrame,
    value_col: str = "value",
    key: str = "user_id",
    ts: str = "ts",
    lookback: int = 12,
    min_obs: int = 8,
    threshold: int = 3,
    scale: float = 100.0,
) -> DataFrame:
    """obs[key, ts, value] (streaming) -> anomaly rows, append mode.

    Emits the identical (key, ts, value, n, dev, z) rows as the batch
    operator run over the full replayed history: the quantization
    (floor(v*scale+0.5)), the trailing-ROWS frame (NULL slots occupy
    positions, aggregates skip them) and the integer flag predicate are
    the same algebra, and the float z is derived from the same exact
    integers through the same IEEE op sequence.

    Precondition (shared with the batch operator): (key, ts) is unique —
    the crawl data model's one-fetch-per-instant invariant. A trailing
    ROWS frame is ill-defined under duplicate timestamps in ANY engine
    (tie order is arbitrary), and this operator's replay-skip
    (``ts <= state watermark``) additionally treats an equal-ts row as a
    redelivery and drops it.
    """
    out_schema, state_schema = _schemas(
        key, obs.schema[key].dataType, ts, obs.schema[ts].dataType, value_col
    )
    t2 = int(threshold) * int(threshold)
    if threshold != int(threshold):
        raise ValueError("threshold must be an integer (stays in int64)")

    def fold(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, vals = state.get
            vals = list(vals)
        else:
            last_ts, vals = None, []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out: list[tuple] = []
        if chunks:
            # concat ALL Arrow chunks and sort once — groups larger than
            # the Arrow batch arrive as several chunks in arbitrary order
            pdf = pd.concat(chunks, ignore_index=True).sort_values(ts)
            for ts_, raw in zip(pdf[ts], pdf[value_col]):
                ts_us = int(pd.Timestamp(ts_).value // 1000)
                if last_ts is not None and ts_us <= last_ts:
                    continue  # replay/out-of-order behind state
                if raw is None or (
                    isinstance(raw, float) and not math.isfinite(raw)
                ):
                    v = None
                else:
                    v = int(math.floor(float(raw) * scale + 0.5))
                live = [x for x in vals if x is not None]
                n = len(live)
                if v is not None and n >= min_obs:
                    s1 = sum(live)
                    s2 = sum(x * x for x in live)
                    nvar = n * s2 - s1 * s1
                    dev = v * n - s1
                    if nvar > 0 and dev * dev * (n - 1) > t2 * n * nvar:
                        z = dev / math.sqrt(n * nvar / (n - 1))
                        out.append((k[0], ts_, float(raw), n, dev, round(z, 4)))
                vals.append(v)
                if len(vals) > lookback:
                    vals.pop(0)
                last_ts = ts_us
        if last_ts is not None:
            state.update((last_ts, vals))
        if out:
            yield pd.DataFrame(
                out, columns=[key, ts, value_col, "n", "dev", "z"]
            )

    return obs.groupBy(key).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
