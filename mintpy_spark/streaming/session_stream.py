"""Streaming gap-based sessionization — the applyInPandasWithState twin
of operators/sessionize.sessionize.

State per key is the one OPEN session: (start_us, last_us, n_events,
vsum) — O(1), like the Kalman twin. Each micro-batch folds its rows in
timestamp order: a row within ``gap`` of the last one extends the open
session (an event EXACTLY gap after its predecessor still merges — the
same <=-keeps boundary rule sessionize_oracle_sql documents), a larger
gap EMITS the closed session and opens a new one. Therefore the emitted
rows over any micro-batch split — including across query restarts — are
exactly the batch sessions MINUS each key's final (still-open) session,
which stays in state until a later event closes it.

NULL values extend sessions (the row has a timestamp) but do not count
into n_events/vsum — identical to the batch aggregation's
count(value)/sum(value) semantics. Precondition shared with the other
streaming twins: (key, ts) unique; ts <= the state watermark is a replay
redelivery and is skipped.

Scale: 32 bytes of state per key; micro-batch cost is one key-partition
shuffle of the delta. Spark's native session_window also streams (the
batch operator's docstring notes it); this explicit-state twin exists
because it emits CLOSED sessions deterministically without a watermark
clock — availableNow replays and bounded-lateness production streams
produce identical output, which is what the driver-hashed parity check
certifies.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_sessionize(
    obs: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
) -> DataFrame:
    """obs[key, ts, value] (streaming) -> closed sessions, append mode:
    (key, session_start, session_end, duration_us, n_events, vsum)."""
    gap_us = int(gap_seconds) * 1_000_000
    ktype = obs.schema[key].dataType
    ttype = obs.schema[ts].dataType
    out_schema = T.StructType([
        T.StructField(key, ktype),
        T.StructField("session_start", ttype),
        T.StructField("session_end", ttype),
        T.StructField("duration_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("vsum", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("vsum", T.DoubleType()),
    ])

    def fold(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            start_us, last_us, n, vsum = state.get
        else:
            start_us = None
            last_us, n, vsum = 0, 0, 0.0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out: list[tuple] = []

        def close():
            out.append((
                k[0],
                pd.Timestamp(start_us * 1000),
                pd.Timestamp(last_us * 1000),
                last_us - start_us,
                n,
                vsum,
            ))

        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(ts)
            for ts_, raw, nn in zip(pdf[ts], pdf[value_col], pdf["_nn"]):
                ts_us = int(pd.Timestamp(ts_).value // 1000)
                if start_us is not None and ts_us <= last_us:
                    continue  # replay/out-of-order behind state
                if start_us is not None and ts_us - last_us > gap_us:
                    close()
                    start_us = None
                if start_us is None:
                    start_us = ts_us
                    n, vsum = 0, 0.0
                last_us = ts_us
                # _nn preserves the NULL/NaN distinction pandas erases:
                # NULL extends the session but is not counted (batch
                # count(value)/sum(value)); a NaN VALUE is non-null
                # there, so it counts and poisons vsum to NaN — in both
                # engines identically
                if nn:
                    n += 1
                    vsum += float(raw)
        if start_us is not None:
            state.update((start_us, last_us, n, vsum))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    key, "session_start", "session_end", "duration_us",
                    "n_events", "vsum",
                ],
            )

    src = obs.withColumn("_nn", F.col(value_col).isNotNull())
    return src.groupBy(key).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
