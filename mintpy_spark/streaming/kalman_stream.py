"""Streaming Kalman local-level filter — the applyInPandasWithState twin
of operators/kalman.kalman_level, closing the sequential-state family's
streaming leg (the batch/EM/adaptive members are queries_r5a).

State per key is exactly what the batch docstring promises a streaming
variant would carry: (last_ts_us, rn, m, p) — two doubles and two longs.
Each micro-batch folds its rows in timestamp order through the identical
four-line recursion (same IEEE op order as the batch operator and the
DuckDB recursive-CTE oracle), so the union of emitted rows over any
micro-batch split — including across query RESTARTS, state restored from
the checkpoint — is bit-identical to the batch filter over the replayed
history.

Preconditions shared with streaming_zscore_anomalies: (key, ts) unique
(one fetch per instant; an equal-or-older ts is treated as a replay
redelivery and skipped), NULL values dropped (no update).

Reference analog: tsview's incremental display filtering / the
update-mode pipeline (smallbaselineApp run_or_skip) — process only the
new epochs, never re-read history.

Scale: state is O(1) per key (vs the zscore monitor's lookback window);
10^9 keys x 32 bytes of state fits the state store comfortably, and each
micro-batch's cost is delta-proportional.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_kalman_level(
    obs: DataFrame,
    value_col: str = "value",
    key: str = "user_id",
    ts: str = "ts",
    q: float = 0.04,
    r: float = 1.0,
) -> DataFrame:
    """obs[key, ts, value] (streaming) -> (key, rn, ts, level), append
    mode; one output row per accepted observation."""
    qq, rr = float(q), float(r)
    ktype = obs.schema[key].dataType
    ttype = obs.schema[ts].dataType
    out_schema = T.StructType([
        T.StructField(key, ktype),
        T.StructField("rn", T.LongType()),
        T.StructField(ts, ttype),
        T.StructField("level", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("rn", T.LongType()),
        T.StructField("m", T.DoubleType()),
        T.StructField("p", T.DoubleType()),
    ])

    def fold(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, rn, m, p = state.get
        else:
            last_ts, rn, m, p = None, 0, 0.0, 0.0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out: list[tuple] = []
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                [ts, value_col]
            )
            for ts_, raw, nn in zip(pdf[ts], pdf[value_col], pdf["_nn"]):
                # NULL carries no update (the batch filter's where-clause);
                # a NaN VALUE is non-null there and flows into the
                # recursion — pandas folds NULL doubles to NaN, so the
                # Spark-side _nn indicator preserves the distinction and
                # keeps stream == batch bit-identical on NaN data too
                if not nn:
                    continue
                ts_us = int(pd.Timestamp(ts_).value // 1000)
                if last_ts is not None and ts_us <= last_ts:
                    continue  # replay/out-of-order behind state
                y = float(raw)
                if rn == 0:
                    m = y
                    p = rr
                else:
                    pp = p + qq
                    kg = pp / (pp + rr)
                    m = m + kg * (y - m)
                    p = (1.0 - kg) * pp
                rn += 1
                last_ts = ts_us
                out.append((k[0], rn, ts_, m))
        if last_ts is not None:
            state.update((last_ts, rn, m, p))
        if out:
            yield pd.DataFrame(out, columns=[key, "rn", ts, "level"])

    src = obs.withColumn("_nn", F.col(value_col).isNotNull())
    return src.groupBy(key).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
