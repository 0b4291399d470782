"""Round-3 additions, batch dd: hot-key skew audit and KS drift.

* skew audit — the diagnostic behind the north rule's "skew handled
  explicitly": BEFORE salting a join/agg key you measure which keys are
  hot.  Top-10 hottest user keys with individual and cumulative share
  in basis points, deterministic user_id tiebreaks.
* KS drift — Kolmogorov-Smirnov companion to the TVD query: the MAX
  cumulative-distribution gap between consecutive weeks' value
  histograms, sharing `operators/drift.consecutive_week_bins`.  KS is
  sensitive to localized shifts TVD averages away; like TVD it stays in
  rational arithmetic (cross products |CUMc*TP - CUMp*TC| are exact
  integers; no libm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load


@_q(
    "skew_audit_user_key",
    """
    WITH c AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1
    ), t AS (
      SELECT SUM(n) AS total FROM c
    ), r AS (
      SELECT user_id, n,
             row_number() OVER (ORDER BY n DESC, user_id NULLS LAST) AS rnk,
             SUM(n) OVER (ORDER BY n DESC, user_id NULLS LAST
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM c
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, user_id,
           CAST(n AS BIGINT) AS n_rows,
           CAST(floor(n * 10000.0 / t.total + 0.5) AS BIGINT) AS share_bp,
           CAST(floor(cum * 10000.0 / t.total + 0.5) AS BIGINT)
             AS cum_share_bp
    FROM r, t WHERE rnk <= 10
    """,
)
def skew_audit_user_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 hottest shuffle keys on user_id with per-key and cumulative
    share (bp) — the audit you run BEFORE deciding to salt a key
    (operators/partitioning.py) or let AQE split it.  A top key holding
    >1/parallelism of the rows is the straggler signature.  Plan: one
    key-count agg (map-side combined), then ranking over the KEY TABLE
    (not raw rows) — at 10^9 keys that window is the only global sort,
    and it sorts key counts, not data; the 1-row total is broadcast.
    Deterministic under ties via the user_id tiebreak."""
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    # NULLS LAST explicitly: Spark ascending defaults NULLS FIRST while
    # DuckDB defaults NULLS LAST — a NULL key tying inside the top-10
    # would fork the rank order (review finding). The NULL key stays IN
    # the audit (it is a real hot join key in practice), just ordered
    # identically on both engines.
    wr = Window.orderBy(F.desc("n"), F.asc_nulls_last("user_id"))
    r = c.select(
        "user_id",
        "n",
        F.row_number().over(wr).alias("rnk"),
        F.sum("n")
        .over(wr.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    ).where(F.col("rnk") <= 10)
    return r.crossJoin(F.broadcast(t)).select(
        F.col("rnk").cast("long").alias("rnk"),
        "user_id",
        F.col("n").cast("long").alias("n_rows"),
        F.floor(F.col("n") * 10000.0 / F.col("total") + 0.5)
        .cast("long")
        .alias("share_bp"),
        F.floor(F.col("cum") * 10000.0 / F.col("total") + 0.5)
        .cast("long")
        .alias("cum_share_bp"),
    )


@_q(
    "ks_drift_weekly",
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
      SELECT event_type, pw, bin, SUM(cur) AS cur, SUM(prev) AS prev
      FROM contrib GROUP BY 1, 2, 3
    ), t AS (
      SELECT event_type, pw, bin, cur, prev,
             SUM(cur) OVER (PARTITION BY event_type, pw) AS tc,
             SUM(prev) OVER (PARTITION BY event_type, pw) AS tp,
             SUM(cur) OVER (PARTITION BY event_type, pw ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cumc,
             SUM(prev) OVER (PARTITION BY event_type, pw ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS cump
      FROM g
    )
    SELECT event_type, CAST(pw AS BIGINT) AS wk,
           CAST(MAX(tp) AS BIGINT) AS n_prev,
           CAST(MAX(tc) AS BIGINT) AS n_cur,
           CAST(floor(10000.0 * MAX(abs(cumc * tp - cump * tc))
                      / (MAX(tc) * MAX(tp)) + 0.5) AS BIGINT) AS ks_bp
    FROM t WHERE tc > 0 AND tp > 0
    GROUP BY 1, 2
    """,
)
def ks_drift_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Smirnov drift per event_type between consecutive
    weeks: max CDF gap over the 10 fixed value bins, in basis points.
    Catches localized distribution shifts that TVD's average washes out;
    identical single-pass scaffolding (consecutive_week_bins) plus a
    bin-ordered cumulative window, all integer cross-products until one
    final double division — no libm, engine-parity-safe."""
    from mintpy_spark.operators.drift import consecutive_week_bins

    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    t = consecutive_week_bins(
        ev,
        F.least(
            F.greatest(F.floor(F.col("value") / 50).cast("long"), F.lit(0)),
            F.lit(9),
        ),
    )
    wcum = (
        Window.partitionBy("event_type", "pw")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t2 = t.select(
        "event_type", "pw", "cur", "prev", "tc", "tp",
        F.sum("cur").over(wcum).alias("cumc"),
        F.sum("prev").over(wcum).alias("cump"),
    )
    return t2.groupBy("event_type", F.col("pw").alias("wk")).agg(
        F.max("tp").cast("long").alias("n_prev"),
        F.max("tc").cast("long").alias("n_cur"),
        F.floor(
            10000.0
            * F.max(F.abs(F.col("cumc") * F.col("tp") - F.col("cump") * F.col("tc")))
            / (F.max("tc") * F.max("tp"))
            + 0.5
        )
        .cast("long")
        .alias("ks_bp"),
    )
