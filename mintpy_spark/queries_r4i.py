"""Round-4 batch i: token-bucket admission simulation — the stateful
ENFORCEMENT twin of rate_limit_audit_1h (queries_r3w.py, which measures
violations but admits everything). Admission decisions feed back into
bucket state, so this is a per-key sequential recursion like the Kalman
and Holt-Winters passes — but in EXACT INTEGER milli-tokens (refill =
dt_us * rate // 1e6 microseconds), so the oracle recursion cannot even
ulp-drift.

Bucket: capacity 3000 mt (3 tokens), refill 1000 mt/hour, seeded full;
an event is admitted iff the refilled level holds >= 1000 mt and then
pays 1000 mt.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

_CAP = 3000          # milli-tokens
_COST = 1000
_RATE_MT_PER_HOUR = 1000
_US_PER_HOUR = 3_600_000_000


@_q(
    "token_bucket_admission",
    f"""
    WITH RECURSIVE e AS (
      SELECT user_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             epoch_us(ts) AS t
      FROM events
    ), rec AS (
      SELECT user_id, rn, t,
             CAST({_CAP} - {_COST} AS BIGINT) AS tokens,
             CAST(1 AS BIGINT) AS admitted
      FROM e WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.rn, e.t,
             CASE WHEN least({_CAP}, rec.tokens
                        + (e.t - rec.t) * {_RATE_MT_PER_HOUR}
                          // {_US_PER_HOUR}) >= {_COST}
                  THEN least({_CAP}, rec.tokens
                        + (e.t - rec.t) * {_RATE_MT_PER_HOUR}
                          // {_US_PER_HOUR}) - {_COST}
                  ELSE least({_CAP}, rec.tokens
                        + (e.t - rec.t) * {_RATE_MT_PER_HOUR}
                          // {_US_PER_HOUR}) END,
             CASE WHEN least({_CAP}, rec.tokens
                        + (e.t - rec.t) * {_RATE_MT_PER_HOUR}
                          // {_US_PER_HOUR}) >= {_COST}
                  THEN 1 ELSE 0 END
      FROM rec JOIN e ON e.user_id = rec.user_id AND e.rn = rec.rn + 1
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT)      AS n_events,
           CAST(SUM(admitted) AS BIGINT) AS n_admitted,
           CAST(COUNT(*) - SUM(admitted) AS BIGINT) AS n_rejected,
           CAST(arg_max(tokens, rn) AS BIGINT) AS final_tokens_mt
    FROM rec GROUP BY user_id
    """,
)
def token_bucket_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key token-bucket simulation (cap 3 tokens, 1 token/hour,
    seeded full, 1 token/event): admitted/rejected counts and the final
    bucket level in milli-tokens. Refill is integer microsecond
    arithmetic — (dt_us * rate) // us_per_hour — so engine and oracle
    step the identical integer state machine.

    Reference analog: the crawl politeness scheduler
    (operators/crawlsched.py:23 closed-form recurrence) enforces
    per-host pacing a priori; the token bucket is the posterior
    admission-control form every crawl frontier actually deploys.

    Scale: one shuffle into the per-key Arrow seam, O(1) integer state —
    the streaming twin is applyInPandasWithState with two BIGINTs.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        "event_id",
    )
    schema = (
        "user_id long, n_events long, n_admitted long, n_rejected long,"
        " final_tokens_mt long"
    )

    def run_sorted(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, grp in pdf.groupby("user_id", sort=False):
            ts = grp["t"].tolist()
            tokens = _CAP - _COST  # first event admits from a full bucket
            admitted = 1
            last = ts[0]
            for t in ts[1:]:
                tokens = min(
                    _CAP,
                    tokens + (t - last) * _RATE_MT_PER_HOUR // _US_PER_HOUR,
                )
                if tokens >= _COST:
                    tokens -= _COST
                    admitted += 1
                last = t
            n = len(ts)
            rows.append((uid, n, admitted, n - admitted, tokens))
        return pd.DataFrame(
            rows,
            columns=[
                "user_id", "n_events", "n_admitted", "n_rejected",
                "final_tokens_mt",
            ],
        )

    from mintpy_spark.operators.seqstate import map_sorted_groups

    return map_sorted_groups(
        ev, "user_id", ("t", "event_id"), run_sorted, schema
    )
