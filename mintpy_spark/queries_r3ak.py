"""Round-3 batch ak: unknown-date TREND breakpoint search (two-segment
least squares) — the slope-shift counterpart of the CUSUM mean-shift
detector, and the search version of the reference's user-dated step /
velocity-change regressors.

The oracle SQL below is GENERATED in lockstep with the engine's fixed op
order: all OLS partials are exact int64 (cents, day indices, integer
window sums), every double is the same op sequence over those integers on
both engines, so the per-candidate SSEs — and therefore the argmin — are
bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

_COLS = ("k", "sv", "svv", "st", "stt", "stv")


def _sse_sql(p: str) -> tuple[str, str]:
    """(sse expression, centered-Stt denominator) for prefix ``p`` —
    mirrors operators/changepoint.trend_break._sse term for term."""
    num = f"(CAST({p}stv AS DOUBLE) - CAST({p}st AS DOUBLE) * {p}sv / {p}k)"
    den = f"(CAST({p}stt AS DOUBLE) - CAST({p}st AS DOUBLE) * {p}st / {p}k)"
    syy = f"(CAST({p}svv AS DOUBLE) - CAST({p}sv AS DOUBLE) * {p}sv / {p}k)"
    return f"({syy} - {num} * {num} / {den})", den


def _trend_break_oracle() -> str:
    lsum = ",\n             ".join(
        f"CAST(SUM({c}) OVER wc AS BIGINT) AS l_{c}" for c in _COLS
    )
    asum = ",\n             ".join(
        f"CAST(SUM({c}) OVER wa AS BIGINT) AS a_{c}" for c in _COLS
    )
    rcols = ", ".join(f"a_{c} - l_{c} AS r_{c}" for c in _COLS)
    sse_l, den_l = _sse_sql("l_")
    sse_r, den_r = _sse_sql("r_")
    sse_1, den_1 = _sse_sql("a_")
    return f"""
    WITH pts AS (
      SELECT user_id AS k_,
             CAST(datediff('day', DATE '2024-01-01',
                  CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS t,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
    ),
    daily AS (
      SELECT k_, t, COUNT(c) AS k, CAST(SUM(c) AS BIGINT) AS sv,
             CAST(SUM(c * c) AS BIGINT) AS svv
      FROM pts GROUP BY k_, t
    ),
    dd AS (
      SELECT k_, t, k, sv, svv,
             k * t AS st, k * t * t AS stt, t * sv AS stv
      FROM daily
    ),
    staged AS (
      SELECT k_, t,
             CAST(row_number() OVER wo AS BIGINT) AS rn,
             CAST(COUNT(*) OVER wa AS BIGINT) AS nd,
             {lsum},
             {asum}
      FROM dd
      WINDOW wo AS (PARTITION BY k_ ORDER BY t),
             wc AS (PARTITION BY k_ ORDER BY t ROWS UNBOUNDED PRECEDING),
             wa AS (PARTITION BY k_ ROWS BETWEEN UNBOUNDED PRECEDING
                    AND UNBOUNDED FOLLOWING)
    ),
    sided AS (SELECT *, {rcols} FROM staged),
    cand AS (
      SELECT k_, t, rn, nd,
             {sse_l} + {sse_r} AS sse_t,
             {sse_1} AS sse_1
      FROM sided
      WHERE rn >= 2 AND nd - rn >= 2
        AND {den_l} > 0 AND {den_r} > 0 AND {den_1} > 0
    ),
    best AS (
      SELECT *, row_number() OVER (
               PARTITION BY k_ ORDER BY sse_t ASC, t ASC) AS rk
      FROM cand
    )
    SELECT k_ AS user_id,
           CAST(DATE '2024-01-01' + CAST(t AS INTEGER) AS TIMESTAMP)
             AS break_day,
           rn AS n_days_left,
           nd - rn AS n_days_right,
           ROUND(sse_t / 10000.0, 4) AS sse_break,
           ROUND(sse_1 / 10000.0, 4) AS sse_single,
           CASE WHEN sse_1 > 0
                THEN ROUND((sse_1 - sse_t) / sse_1, 6) END AS gain
    FROM best WHERE rk = 1
    """


@_q("trend_break_detect", _trend_break_oracle())
def trend_break_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single trend breakpoint per key: the day boundary whose
    two-segment OLS split minimizes total SSE
    (operators/changepoint.trend_break) — exact-integer partials, fixed
    double op order, single Exchange."""
    from mintpy_spark.operators.changepoint import trend_break

    ev = load(spark, sf_dir, "events")
    return trend_break(ev, "value", key="user_id", ts="ts")
