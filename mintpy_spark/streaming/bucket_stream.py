"""Streaming token-bucket admission — the applyInPandasWithState twin of
token_bucket_admission (queries_tiers), fifth and final member of the
sequential-state streaming family. Unlike the float twins this one is
EXACT INTEGER state (milli-tokens; refill = dt_us * rate // us_per_hour)
so stream == batch cannot even ulp-drift.

State per key: (last_ts_us, n, admitted, tokens) — four longs. Each
micro-batch steps the identical integer state machine in timestamp
order; per-event admission decisions are emitted in append mode, and the
final aggregate over any replay/restart split equals the batch
simulation.

Preconditions shared with the other twins: (key, ts) unique; ts <= the
state watermark is a replay redelivery and is skipped.

Reference analog: the crawl frontier's posterior admission control
(operators/crawlsched.py enforces pacing a priori; the bucket is what a
live fetcher actually consults per request).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_token_bucket(
    obs: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    cap_mt: int = 3000,
    cost_mt: int = 1000,
    rate_mt_per_hour: int = 1000,
) -> DataFrame:
    """obs[key, ts] (streaming) -> (key, rn, ts, admitted, tokens_mt),
    append mode; one decision row per event."""
    cap, cost, rate = int(cap_mt), int(cost_mt), int(rate_mt_per_hour)
    us_per_hour = 3_600_000_000
    ktype = obs.schema[key].dataType
    ttype = obs.schema[ts].dataType
    out_schema = T.StructType([
        T.StructField(key, ktype),
        T.StructField("rn", T.LongType()),
        T.StructField(ts, ttype),
        T.StructField("admitted", T.BooleanType()),
        T.StructField("tokens_mt", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("admitted", T.LongType()),
        T.StructField("tokens", T.LongType()),
    ])

    def fold(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, n, adm, tokens = state.get
        else:
            last_ts, n, adm, tokens = None, 0, 0, 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out: list[tuple] = []
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(ts)
            for ts_ in pdf[ts]:
                ts_us = int(pd.Timestamp(ts_).value // 1000)
                if last_ts is not None and ts_us <= last_ts:
                    continue  # replay/out-of-order behind state
                if n == 0:
                    tokens = cap - cost  # first event admits from full
                    ok = True
                else:
                    tokens = min(
                        cap,
                        tokens + (ts_us - last_ts) * rate // us_per_hour,
                    )
                    ok = tokens >= cost
                    if ok:
                        tokens -= cost
                n += 1
                adm += 1 if ok else 0
                last_ts = ts_us
                out.append((k[0], n, ts_, ok, tokens))
        if last_ts is not None:
            state.update((last_ts, n, adm, tokens))
        if out:
            yield pd.DataFrame(
                out, columns=[key, "rn", ts, "admitted", "tokens_mt"]
            )

    return obs.groupBy(key).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
