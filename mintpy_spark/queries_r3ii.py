"""Round-3 batch ii: coverage sweep, bounce rate, and FK integrity.

- ``coverage_seconds_daily``: seconds of each day covered by >=1 active
  session — the classic interval-union sweep (boundary +1/-1 events,
  running concurrency, sum gaps while concurrency > 0), the uptime/SLA
  twin of sessions_concurrent_peak.
- ``session_bounce_daily``: share of single-event sessions per day,
  composed over the ONE portable session formulation
  (sessionize_oracle_sql) so gap semantics can never fork.
- ``fk_orphan_audit``: referential-integrity rates across the TPC-H-ish
  tables (lineitem->orders/part/supplier, orders->customer) — the
  data-quality gate a 10^12-row ingest runs before publishing a
  snapshot; each check is one anti-join count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.operators.sessionize import sessionize, sessionize_oracle_sql
from mintpy_spark.queries import _q, load


@_q(
    "coverage_seconds_daily",
    f"""
    WITH base AS ({sessionize_oracle_sql()}
    ), iv AS (
      -- clip sessions to day bounds after splitting them across the days
      -- they span; +1us end so zero-length sessions still cover a point
      SELECT ed,
             GREATEST(epoch_us(session_start), ed * 86400000000) AS lo,
             LEAST(epoch_us(session_end) + 1, (ed + 1) * 86400000000) AS hi
      FROM base, LATERAL unnest(generate_series(
             epoch_us(session_start) // 86400000000,
             epoch_us(session_end) // 86400000000)) AS t(ed)
    ), pts AS (
      SELECT ed, lo AS t, 1 AS d FROM iv
      UNION ALL
      SELECT ed, hi AS t, -1 AS d FROM iv
    ), sweep AS (
      SELECT ed, t, d,
             SUM(d) OVER (PARTITION BY ed ORDER BY t, d DESC
                          ROWS UNBOUNDED PRECEDING) AS conc,
             lead(t) OVER (PARTITION BY ed ORDER BY t, d DESC) AS nxt
      FROM pts
    )
    SELECT ed, CAST(SUM(CASE WHEN conc > 0 THEN nxt - t ELSE 0 END)
                    AS BIGINT) AS covered_us,
           CAST(COUNT(DISTINCT CASE WHEN d = 1 THEN t END) AS BIGINT)
             AS n_starts
    FROM sweep GROUP BY 1
    """,
)
def coverage_seconds_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union sweep: microseconds of each epoch-day covered by at
    least one session (any user). Sessions are split across the days they
    span, endpoints become +1/-1 boundary events, and a running
    concurrency window sums the gaps where concurrency > 0 — one
    windowed pass, never an O(n^2) overlap join. Ties order arrivals
    before departures (d DESC) so touching intervals merge."""
    ev = load(spark, sf_dir, "events")
    s = sessionize(ev, key="user_id", ts="ts", gap="30 minutes")
    day = 86400000000
    iv = (
        s.select(
            F.unix_micros(F.col("session_start").cast("timestamp")).alias("s"),
            (F.unix_micros(F.col("session_end").cast("timestamp")) + 1).alias("e"),
        )
        .withColumn(
            "ed",
            F.explode(
                F.sequence(
                    F.expr(f"s div {day}"), F.expr(f"(e - 1) div {day}")
                )
            ),
        )
        .select(
            "ed",
            F.greatest(F.col("s"), F.col("ed") * day).alias("lo"),
            F.least(F.col("e"), (F.col("ed") + 1) * day).alias("hi"),
        )
    )
    pts = iv.select("ed", F.col("lo").alias("t"), F.lit(1).alias("d")).unionAll(
        iv.select("ed", F.col("hi").alias("t"), F.lit(-1).alias("d"))
    )
    w = Window.partitionBy("ed").orderBy(F.asc("t"), F.desc("d"))
    sweep = pts.select(
        "ed",
        "t",
        "d",
        F.sum("d").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("conc"),
        F.lead("t").over(w).alias("nxt"),
    )
    return sweep.groupBy("ed").agg(
        F.sum(
            F.when(F.col("conc") > 0, F.col("nxt") - F.col("t")).otherwise(0)
        ).cast("long").alias("covered_us"),
        F.countDistinct(F.when(F.col("d") == 1, F.col("t"))).alias("n_starts"),
    )


@_q(
    "session_bounce_daily",
    f"""
    WITH base AS ({sessionize_oracle_sql()}
    )
    SELECT date_diff('day', DATE '1970-01-01', CAST(session_start AS DATE)) AS ed,
           COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounce
    FROM base GROUP BY 1
    """,
)
def session_bounce_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate inputs per day-of-session-start: single-event sessions
    vs total. Partials (count, bounce count) instead of the ratio — the
    division is the caller's, keeping the oracle hash integer-exact."""
    ev = load(spark, sf_dir, "events")
    s = sessionize(ev, key="user_id", ts="ts", gap="30 minutes")
    return s.select(
        F.datediff(F.to_date("session_start"), F.lit("1970-01-01")).alias("ed"),
        "n_events",
    ).groupBy("ed").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("long")).alias("n_bounce"),
    )


@_q(
    "fk_orphan_audit",
    """
    SELECT 'lineitem->orders' AS fk,
           (SELECT COUNT(*) FROM lineitem) AS n_rows,
           (SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS n_orphan
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM part p
                               WHERE p.p_partkey = l.l_partkey))
    UNION ALL
    SELECT 'lineitem->supplier',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM supplier s
                               WHERE s.s_suppkey = l.l_suppkey))
    UNION ALL
    SELECT 'orders->customer',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
    """,
)
def fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for each FK edge.

    ONE pass over each fact table: lineitem's three FK edges share a
    single key-pruned scan with three broadcast LEFT joins (a null dim
    key = an orphan), folded by one agg; orders->customer is the same
    one-pass shape. The per-edge anti-join form scanned lineitem six
    times — at 100 TB the fact scan IS the cost, so edges must share
    it. Dim keys are primary keys, so the left joins cannot fan out."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    ok = o.select(F.col("o_orderkey").alias("_ok"))
    pk = load(spark, sf_dir, "part").select(F.col("p_partkey").alias("_pk"))
    sk = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("_sk")
    )
    ck = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("_ck")
    )

    def _miss(col: str):
        return F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).cast("long")

    li_agg = (
        li.select("l_orderkey", "l_partkey", "l_suppkey")
        .join(F.broadcast(ok), F.col("l_orderkey") == F.col("_ok"), "left")
        .join(F.broadcast(pk), F.col("l_partkey") == F.col("_pk"), "left")
        .join(F.broadcast(sk), F.col("l_suppkey") == F.col("_sk"), "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _miss("_ok").alias("no_o"),
            _miss("_pk").alias("no_p"),
            _miss("_sk").alias("no_s"),
        )
    )
    o_agg = (
        o.select("o_custkey")
        .join(F.broadcast(ck), F.col("o_custkey") == F.col("_ck"), "left")
        .agg(F.count(F.lit(1)).alias("n"), _miss("_ck").alias("no_c"))
    )

    def _rows(agg, triples):
        return agg.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(fk).alias("fk"),
                            F.col("n").alias("n_rows"),
                            F.col(c).alias("n_orphan"),
                        )
                        for fk, c in triples
                    ]
                )
            ).alias("r")
        ).select("r.*")

    return _rows(
        li_agg,
        [
            ("lineitem->orders", "no_o"),
            ("lineitem->part", "no_p"),
            ("lineitem->supplier", "no_s"),
        ],
    ).unionAll(_rows(o_agg, [("orders->customer", "no_c")]))
