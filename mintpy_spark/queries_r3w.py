"""Round-3 additions, batch w: HLL register tier, Bloom membership tier,
and a sliding-window rate-limiter audit.

* HLL distinct tier — the register-based mergeable distinct sketch next
  to the KMV tier: 64 max-registers per bucket, merged idempotently
  (MAX), with an integer-exact scaled harmonic sum so the one double
  division is oracle-identical.  Spark builds the 1d tier by MERGING two
  disjoint halves of the stream; the oracle builds registers directly
  from raw rows — hash equality proves the loss-free idempotent fold.
* Bloom membership tier — the presence bitmap's hash-addressed twin for
  UNBOUNDED key domains: 252-bit filters built row-locally and bit_or
  merged, probed against the full (user x day) candidate grid with
  exact-membership reconciliation (false positives counted; false
  negatives impossible — asserted by construction in tests).
* rate-limit audit — exact max-events-in-any-trailing-hour per user via
  a RANGE window over integer epoch seconds (order-independent under
  same-second ties), the abuse/throttle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.operators.cadence import rate_limit_audit
from mintpy_spark.operators.sketch import (
    HLL_BUCKETS,
    HLL_EST_NUM,
    HLL_MAX_RHO,
    bloom_probe,
    bloom_tier,
    hll_estimate,
    hll_merge,
    hll_tier,
)
from mintpy_spark.queries import _q, load


@_q(
    "rollup_1d_distinct_hll",
    f"""
    WITH e AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
             user_id,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL
    ), r AS (
      SELECT bucket_start, h % {HLL_BUCKETS} AS bucket,
             MAX(CASE WHEN (h // {HLL_BUCKETS}) = 0 THEN {HLL_MAX_RHO}
                      ELSE bit_count(((h // {HLL_BUCKETS})
                                      & -(h // {HLL_BUCKETS})) - 1) + 1
                 END) AS r
      FROM e GROUP BY 1, 2
    ), s AS (
      SELECT bucket_start,
             CAST(COUNT(*) AS BIGINT) AS n_regs,
             CAST(SUM(1::BIGINT << ({HLL_MAX_RHO} - r))
                  + ({HLL_BUCKETS} - COUNT(*))
                    * (1::BIGINT << {HLL_MAX_RHO}) AS BIGINT) AS sum_scaled
      FROM r GROUP BY 1
    ), x AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
             COUNT(DISTINCT user_id) AS exact_distinct
      FROM events WHERE user_id IS NOT NULL GROUP BY 1
    )
    SELECT s.bucket_start, s.n_regs, s.sum_scaled,
           CAST(floor({HLL_EST_NUM!r} / CAST(s.sum_scaled AS DOUBLE) + 0.5)
                AS BIGINT) AS est_distinct,
           CAST(x.exact_distinct AS BIGINT) AS exact_distinct
    FROM s JOIN x USING (bucket_start)
    """,
)
def rollup_1d_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per day via a 64-register HLL tier, the Spark side
    built by MERGING two disjoint halves of the stream (event_id parity)
    while the oracle computes registers straight from raw rows — hash
    equality proves the MAX-merge is loss-free and idempotent (the
    presence-bitmap proof shape).  Exact distinct joined alongside so the
    estimator error is visible.  Plan: two pruned scans -> register hash
    aggs whose Exchanges carry <= 64 rows per day -> MAX merge -> tiny
    estimate agg; no register ever leaves integer arithmetic until the
    single oracle-identical double division."""
    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    even = hll_tier(ev.where(F.col("event_id") % 2 == 0), "user_id", "1d", ts="ts")
    odd = hll_tier(ev.where(F.col("event_id") % 2 == 1), "user_id", "1d", ts="ts")
    merged = hll_merge(even.unionByName(odd), "1d")
    est = hll_estimate(merged)
    exact = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("bucket_start")
    ).agg(F.count_distinct("user_id").cast("long").alias("exact_distinct"))
    return est.join(exact, "bucket_start").select(
        "bucket_start", "n_regs", "sum_scaled", "est_distinct", "exact_distinct"
    )


@_q(
    "bloom_presence_fp",
    """
    WITH present AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, user_id
      FROM events WHERE user_id IS NOT NULL
    ), users AS (
      SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL
    ), days AS (
      SELECT DISTINCT d FROM present
    ), pos AS (
      SELECT user_id, t.i,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR) || '|' || t.i),
                                1, 15))::BIGINT % 252 AS p
      FROM users, unnest([0, 1, 2]) AS t(i)
    ), bloom AS (
      SELECT pr.d, pos.p // 63 AS w,
             bit_or(1::BIGINT << CAST(pos.p % 63 AS INT)) AS bits
      FROM present pr JOIN pos USING (user_id)
      GROUP BY 1, 2
    ), probe AS (
      SELECT dy.d, u.user_id,
             bool_and(coalesce((b.bits >> CAST(p.p % 63 AS INT)) & 1, 0) = 1)
               AS hit
      FROM users u
      CROSS JOIN days dy
      JOIN pos p USING (user_id)
      LEFT JOIN bloom b ON b.d = dy.d AND b.w = p.p // 63
      GROUP BY 1, 2
    )
    SELECT pb.d AS bucket_start,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(COUNT(*) FILTER (pr.user_id IS NOT NULL) AS BIGINT)
             AS exact_active,
           CAST(COUNT(*) FILTER (pb.hit) AS BIGINT) AS bloom_hits,
           CAST(COUNT(*) FILTER (pb.hit AND pr.user_id IS NULL) AS BIGINT)
             AS false_pos
    FROM probe pb
    LEFT JOIN present pr ON pr.d = pb.d AND pr.user_id = pb.user_id
    GROUP BY 1
    """,
)
def bloom_presence_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day 252-bit Bloom filters over active users, probed with the
    full (user x day) candidate grid and reconciled against exact
    membership: hits, exact actives, and false positives per day (false
    negatives are impossible — every member's bits were OR'd in).  The
    sandbox probes the cross grid to audit the fp rate end-to-end; at
    scale you probe a candidate stream against the same filter table.
    Plan: filters built ROW-LOCALLY (k=3 conditional bits folded per
    int64 word, no explode) -> one bit_or agg whose Exchange carries 4
    longs per day; the probe is a broadcast-sized join against the
    day-filter table plus one exact-membership left join."""
    # NULL users excluded on BOTH engines: the oracle's JOIN pos USING
    # (user_id) silently drops NULL while a crossJoin probe grid would
    # keep it, forking n_probes (review finding)
    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    present = ev.select(
        F.date_trunc("day", F.col("ts")).alias("d"), "user_id"
    ).distinct()
    bloom = bloom_tier(present, "user_id", key_cols=("d",))
    users = ev.select("user_id").distinct()
    days = present.select("d").distinct()
    probes = users.crossJoin(days)
    hits = bloom_probe(bloom, probes, "user_id", key_cols=("d",))
    rec = hits.join(
        present.withColumn("_member", F.lit(1)), ["d", "user_id"], "left"
    )
    return rec.groupBy(F.col("d").alias("bucket_start")).agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum((F.col("_member").isNotNull()).cast("long"))
        .cast("long")
        .alias("exact_active"),
        F.sum(F.col("bloom_hit").cast("long")).cast("long").alias("bloom_hits"),
        F.sum(
            (F.col("bloom_hit") & F.col("_member").isNull()).cast("long")
        )
        .cast("long")
        .alias("false_pos"),
    )


@_q(
    "rate_limit_audit_1h",
    """
    WITH e AS (
      SELECT user_id, epoch_us(ts) // 1000000 AS s FROM events
    ), c AS (
      SELECT user_id,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY s
                            RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
               AS cnt
      FROM e
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(cnt) AS BIGINT) AS max_in_window,
           CAST(SUM(CASE WHEN cnt > 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS windows_over,
           MAX(cnt) > 2 AS violated
    FROM c GROUP BY 1
    """,
)
def rate_limit_audit_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact sliding-window rate-limiter audit: per user, the max number
    of events in ANY trailing hour and how many events sit in an
    over-limit (>2) window.  RANGE (not ROWS) framing over integer epoch
    seconds makes same-second ties symmetric — deterministic at any
    parallelism with no tiebreak column.  Plan: one Exchange on user_id
    for the window (partition-local sort), one per-user hash agg."""
    return rate_limit_audit(load(spark, sf_dir, "events"), limit=2)
