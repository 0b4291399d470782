"""Round-3 additions, batch bb: co-occurrence lift, distribution-drift
TVD, and the interval-concurrency sweep.

* co-occurrence lift — the market-basket association measure over
  (day, user) baskets: lift(a,b) = P(a,b) / (P(a) P(b)) in ppm.  The
  pair join is CO-LOCATED on the basket key and bounded by |types|^2
  per basket, never data volume (the audience-overlap shape with a
  probabilistic numerator).
* weekly TVD drift — total-variation distance between consecutive
  weeks' value histograms per event_type, in basis points.  TVD instead
  of PSI/KL deliberately: those need ln(), the one libm call with NO
  cross-engine parity guarantee; TVD is rational arithmetic end-to-end.
  Single-pass: each (type, week, bin) count contributes to its own week
  pair AND the next week's pair, so one agg + one window produces every
  consecutive-week comparison with no self-join.
* concurrency peak — sweep-line max-overlap of sessions per day
  (ClickHouse maxIntersections), the capacity-planning staple.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.operators.sessionize import (
    concurrent_peak_daily,
    sessionize,
    sessionize_oracle_sql,
)
from mintpy_spark.plans.cache import persist_slot
from mintpy_spark.queries import _q, load

_BASKET_SLOT: list = []


@_q(
    "cooccurrence_lift_daily",
    """
    WITH b AS (
      SELECT DISTINCT
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed,
             user_id, event_type
      FROM events WHERE user_id IS NOT NULL
    ), n AS (
      SELECT COUNT(DISTINCT (ed, user_id)) AS total FROM b
    ), m AS (
      SELECT event_type, COUNT(*) AS cnt FROM b GROUP BY 1
    ), p AS (
      SELECT x.event_type AS type_a, y.event_type AS type_b,
             COUNT(*) AS n_ab
      FROM b x JOIN b y
        ON x.ed = y.ed AND x.user_id = y.user_id
       AND x.event_type < y.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b,
           CAST(p.n_ab AS BIGINT) AS n_ab,
           CAST(ma.cnt AS BIGINT) AS n_a,
           CAST(mb.cnt AS BIGINT) AS n_b,
           CAST(floor(CAST(p.n_ab AS DOUBLE) * n.total / ma.cnt / mb.cnt
                      * 1000000 + 0.5) AS BIGINT) AS lift_ppm
    FROM p JOIN m ma ON ma.event_type = p.type_a
           JOIN m mb ON mb.event_type = p.type_b
           CROSS JOIN n
    """,
)
def cooccurrence_lift_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift between event types over (day, user) baskets:
    lift > 1e6 ppm means the pair co-occurs more than independence
    predicts.  Plan: one distinct pass; the pair self-join is CO-LOCATED
    on (day, user) — the same Exchange — and bounded by |types| choose 2
    per basket; margins and the 1-row total are broadcast.  The lift
    division runs in double with the identical expression order on both
    engines (integer products would overflow at production counts)."""
    # NULL users excluded on both engines: COUNT(DISTINCT (ed, user_id))
    # vs Spark distinct-count disagree on NULL-bearing tuples
    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    from mintpy_spark.operators.bitmap import epoch_day

    # the basket table feeds FOUR consumers (total, margins, both join
    # sides); one-slot persist keeps it to a single scan + distinct
    b = persist_slot(
        ev.select(
            epoch_day("ts").alias("ed"), "user_id", "event_type"
        ).distinct(),
        _BASKET_SLOT,
    )
    total = b.select("ed", "user_id").distinct().count()
    m = b.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    x, y = b.alias("x"), b.alias("y")
    p = (
        x.join(
            y,
            (F.col("x.ed") == F.col("y.ed"))
            & (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ma = m.select(F.col("event_type").alias("type_a"), F.col("cnt").alias("n_a"))
    mb = m.select(F.col("event_type").alias("type_b"), F.col("cnt").alias("n_b"))
    return (
        p.join(F.broadcast(ma), "type_a")
        .join(F.broadcast(mb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.floor(
                F.col("n_ab").cast("double")
                * F.lit(total)
                / F.col("n_a")
                / F.col("n_b")
                * 1000000
                + 0.5
            )
            .cast("long")
            .alias("lift_ppm"),
        )
    )


@_q(
    "drift_tvd_weekly",
    """
    WITH base AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk,
             least(greatest(CAST(floor(value / 50) AS BIGINT), 0), 9) AS bin,
             COUNT(*) AS c
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2, 3
    ), contrib AS (
      SELECT event_type, wk AS pw, bin, c AS cur, 0 AS prev FROM base
      UNION ALL
      SELECT event_type, wk + 1, bin, 0, c FROM base
    ), g AS (
      SELECT event_type, pw, bin,
             SUM(cur) AS cur, SUM(prev) AS prev
      FROM contrib GROUP BY 1, 2, 3
    ), t AS (
      SELECT event_type, pw, bin, cur, prev,
             SUM(cur) OVER (PARTITION BY event_type, pw) AS tc,
             SUM(prev) OVER (PARTITION BY event_type, pw) AS tp
      FROM g
    )
    SELECT event_type, CAST(pw AS BIGINT) AS wk,
           CAST(MAX(tp) AS BIGINT) AS n_prev,
           CAST(MAX(tc) AS BIGINT) AS n_cur,
           CAST(floor(5000.0 * SUM(abs(cur * tp - prev * tc))
                      / (MAX(tc) * MAX(tp)) + 0.5) AS BIGINT) AS tvd_bp
    FROM t WHERE tc > 0 AND tp > 0
    GROUP BY 1, 2
    """,
)
def drift_tvd_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift per event_type: total-variation distance (bp)
    between consecutive weeks' value histograms (10 fixed bins of 50).
    TVD = 0.5 * sum |p_i - q_i| stays in RATIONAL arithmetic — cross
    products |c_i*TQ - d_i*TP| are exact integers, one double division
    at the end — where PSI/KL would need ln() with no engine-parity
    guarantee.  Single-pass: each (type, week, bin) count feeds its own
    pair AND the next week's pair (contribution rows), so one agg + one
    window covers every consecutive-week comparison with no self-join.
    Plan: histogram agg Exchange, contribution fan-out x2 (bounded),
    window over |bins|-sized partitions, tiny final agg."""
    from mintpy_spark.operators.drift import consecutive_week_bins

    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    t = consecutive_week_bins(
        ev,
        F.least(
            F.greatest(F.floor(F.col("value") / 50).cast("long"), F.lit(0)),
            F.lit(9),
        ),
    )
    return t.groupBy("event_type", F.col("pw").alias("wk")).agg(
        F.max("tp").cast("long").alias("n_prev"),
        F.max("tc").cast("long").alias("n_cur"),
        F.floor(
            5000.0
            * F.sum(F.abs(F.col("cur") * F.col("tp") - F.col("prev") * F.col("tc")))
            / (F.max("tc") * F.max("tp"))
            + 0.5
        )
        .cast("long")
        .alias("tvd_bp"),
    )


@_q(
    "sessions_concurrent_peak",
    # the session CTE is sessionize_oracle_sql — the ONE portable session
    # formulation (boundary rule verified against session_window there);
    # composing over it means the exact-gap semantics can never fork
    f"""
    WITH base AS ({sessionize_oracle_sql()}
    ), iv AS (
      SELECT epoch_us(session_start) AS s, epoch_us(session_end) + 1 AS e
      FROM base
    ), seg AS (
      SELECT t.ed,
             greatest(iv.s, t.ed * 86400000000) AS lo,
             least(iv.e, (t.ed + 1) * 86400000000) AS hi
      FROM iv, unnest(range(iv.s // 86400000000,
                            (iv.e - 1) // 86400000000 + 1)) AS t(ed)
    ), sweep AS (
      SELECT ed, lo AS t, 1 AS d FROM seg
      UNION ALL
      SELECT ed, hi, -1 FROM seg
    ), run AS (
      SELECT ed,
             SUM(d) OVER (PARTITION BY ed ORDER BY t, d
                          ROWS UNBOUNDED PRECEDING) AS c
      FROM sweep
    )
    SELECT CAST(ed AS BIGINT) AS ed,
           CAST(COUNT(*) / 2 AS BIGINT) AS n_segments,
           CAST(MAX(c) AS BIGINT) AS peak_concurrent
    FROM run GROUP BY 1
    """,
)
def sessions_concurrent_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max concurrent 30-minute-gap sessions per day — the sweep-line
    interval-overlap census (ClickHouse maxIntersections) over the
    engine's own sessionization.  Sessions crossing midnight are clipped
    into per-day segments; the sweep orders (+1/-1) points by (t, delta)
    so touching sessions never overlap.  Plan: session agg (one user
    Exchange), bounded day explode, ONE day-keyed window Exchange with
    partition-local sort, per-day max — no global ordering anywhere."""
    ev = load(spark, sf_dir, "events")
    s = sessionize(ev, key="user_id", ts="ts", value_col="value")
    return concurrent_peak_daily(s)
