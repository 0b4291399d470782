"""Streaming Welford online moments — the applyInPandasWithState twin of
the batch single-pass (n, mean, M2) recursion (welford_online_var),
fourth member of the sequential-state streaming family (Kalman,
Holt-Winters, gap sessions).

State per key: (last_ts_us, n, mean, m2) — three doubles and two longs,
exactly the mergeable-free per-key state the batch docstring promises a
streaming maintainer keeps. Each micro-batch folds rows in (ts, value)
order through the identical three-line update, so after any replay —
including across query restarts — the final (n, mean, M2) per key is
bit-identical to the batch pass over the full history.

Preconditions shared with the other twins: (key, ts) unique; ts <= the
state watermark is a replay redelivery and is skipped; NULL values are
skipped (the batch where-clause) while NaN values flow into the
recursion — the Spark-side _nn indicator preserves the distinction
pandas erases.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_welford(
    obs: DataFrame,
    value_col: str = "value",
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """obs[key, ts, value] (streaming) -> (key, n, ts, mean, m2), append
    mode; one output row per accepted observation (running state after
    it — the final row per key, max n, is the batch answer)."""
    ktype = obs.schema[key].dataType
    ttype = obs.schema[ts].dataType
    out_schema = T.StructType([
        T.StructField(key, ktype),
        T.StructField("n", T.LongType()),
        T.StructField(ts, ttype),
        T.StructField("mean", T.DoubleType()),
        T.StructField("m2", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("m2", T.DoubleType()),
    ])

    def fold(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, n, mean, m2 = state.get
        else:
            last_ts, n, mean, m2 = None, 0, 0.0, 0.0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out: list[tuple] = []
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                [ts, value_col]
            )
            for ts_, raw, nn in zip(pdf[ts], pdf[value_col], pdf["_nn"]):
                if not nn:
                    continue  # NULL observation carries no update
                ts_us = int(pd.Timestamp(ts_).value // 1000)
                if last_ts is not None and ts_us <= last_ts:
                    continue  # replay/out-of-order behind state
                y = float(raw)
                if n == 0:
                    n, mean, m2 = 1, y, 0.0
                else:
                    n2 = n + 1
                    delta = y - mean
                    mean_new = mean + delta / float(n2)
                    m2 = m2 + delta * (y - mean_new)
                    mean = mean_new
                    n = n2
                last_ts = ts_us
                out.append((k[0], n, ts_, mean, m2))
        if last_ts is not None:
            state.update((last_ts, n, mean, m2))
        if out:
            yield pd.DataFrame(
                out, columns=[key, "n", ts, "mean", "m2"]
            )

    src = obs.withColumn("_nn", F.col(value_col).isNotNull())
    return src.groupBy(key).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
