"""Streaming Holt-Winters additive smoother — the applyInPandasWithState
twin of operators/holtwinters.holt_winters_additive, completing the
sequential-state family's streaming leg alongside the Kalman filter
(streaming/kalman_stream.py) and the gap sessionizer.

Input contract: FINALIZED per-key buckets in event-time order — exactly
what the watermark-finalized 1d tier append (streaming/rollup_stream.py)
emits downstream; this operator composes after it in a production
topology. State per key is what the batch docstring promises: level,
trend, and the P rotating seasonal slots (P + 2 doubles; P = 7 fields
here, mirroring the oracle's explicit s0..s6 recursion columns), plus
(last_ts_us, rn). Each micro-batch folds rows in bucket order through
the identical three-line recursion, so emitted rows over any micro-batch
split — including across query restarts — are bit-identical to the
batch pass over the replayed history.

Preconditions shared with the other twins: (key, bucket) unique; a
bucket at or behind the state watermark is a replay redelivery and is
skipped; NULL values are skipped (the batch where-clause) while NaN
values flow into the recursion — the Spark-side _nn indicator preserves
the distinction pandas erases.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_P = 7


def streaming_holt_winters(
    obs: DataFrame,
    value_col: str = "y",
    key: str = "user_id",
    ts: str = "bucket_start",
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
) -> DataFrame:
    """obs[key, ts, value] (streaming, finalized buckets) ->
    (key, rn, ts, level, trend, seasonal), append mode."""
    a, b_, g = float(alpha), float(beta), float(gamma)
    ktype = obs.schema[key].dataType
    ttype = obs.schema[ts].dataType
    out_schema = T.StructType([
        T.StructField(key, ktype),
        T.StructField("rn", T.LongType()),
        T.StructField(ts, ttype),
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
        T.StructField("seasonal", T.DoubleType()),
    ])
    state_schema = T.StructType(
        [
            T.StructField("last_ts_us", T.LongType()),
            T.StructField("rn", T.LongType()),
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
        ]
        + [T.StructField(f"s{j}", T.DoubleType()) for j in range(_P)]
    )

    def fold(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
            last_ts, rn, lev, tr = st[0], st[1], st[2], st[3]
            season = list(st[4 : 4 + _P])
        else:
            last_ts, rn, lev, tr = None, 0, 0.0, 0.0
            season = [0.0] * _P
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out: list[tuple] = []
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                [ts, value_col]
            )
            for ts_, raw, nn in zip(pdf[ts], pdf[value_col], pdf["_nn"]):
                if not nn:
                    continue  # NULL bucket carries no update
                ts_us = int(pd.Timestamp(ts_).value // 1000)
                if last_ts is not None and ts_us <= last_ts:
                    continue  # replay/out-of-order behind state
                y = float(raw)
                if rn == 0:
                    lev, tr = y, 0.0
                    s_out = 0.0
                else:
                    i = rn  # 0-based position of this row == prior count
                    s_old = season[i % _P]
                    l_new = a * (y - s_old) + (1.0 - a) * (lev + tr)
                    tr = b_ * (l_new - lev) + (1.0 - b_) * tr
                    s_new = g * (y - l_new) + (1.0 - g) * s_old
                    season[i % _P] = s_new
                    lev = l_new
                    s_out = s_new
                rn += 1
                last_ts = ts_us
                out.append((k[0], rn, ts_, lev, tr, s_out))
        if last_ts is not None:
            state.update(tuple([last_ts, rn, lev, tr] + season))
        if out:
            yield pd.DataFrame(
                out, columns=[key, "rn", ts, "level", "trend", "seasonal"]
            )

    src = obs.withColumn("_nn", F.col(value_col).isNotNull())
    return src.groupBy(key).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
