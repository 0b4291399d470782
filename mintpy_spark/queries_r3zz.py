"""Round-3 batch zz: sketch-algebra closures — the merge/difference
operations that make the sketch family a tier ALGEBRA rather than a
bag of one-shot estimators.

* ``hll_merge_30d_distinct`` — daily HLL registers folded into the 30d
  tier by register MAX (idempotent merge), raw estimate vs exact. The
  proof obligation: merging day sketches equals sketching the month.
* ``kmv_anotb_audience`` — theta-sketch set DIFFERENCE (A-not-B):
  audience exclusivity between event types from the same KMV sketches
  the intersection query uses. Asymmetric, so both directions emit.
* ``cms_30d_merge_topfreq`` — daily Count-Min sketches summed into the
  30d tier, probed for every event type, with the one-sided error
  visible as est - exact >= 0.

All hashes are the shared portable md5 forms; every estimate is
integer/one-division arithmetic, so the whole algebra is
oracle-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.functions.timefn import bucket_start
from mintpy_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_BUCKETS,
    HLL_EST_NUM,
    HLL_MAX_RHO,
    cms_estimate,
    cms_merge,
    cms_tier,
    hll_estimate,
    hll_merge,
    hll_tier,
    kmv_set,
)
from mintpy_spark.queries import _q, load
from mintpy_spark.queries_r3 import KMV_K

_SPACE = 16**15
_B30_SQL = (
    "TIMESTAMP '1970-01-01'"
    " + (CAST(floor(epoch(ts)) AS BIGINT)"
    "    - CAST(floor(epoch(ts)) AS BIGINT) % 2592000) * INTERVAL 1 SECOND"
)


@_q(
    "hll_merge_30d_distinct",
    f"""
    WITH e AS (
      SELECT {_B30_SQL} AS bucket_start,
             user_id,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               AS h
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
      SELECT {_B30_SQL} AS bucket_start,
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
def hll_merge_30d_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30d distinct users from DAY-tier HLL registers folded upward with
    hll_merge (register MAX — associative, commutative, idempotent: the
    oracle sketches the month directly and must land on identical
    registers). The merge Exchange carries <= 64 rows per day bucket;
    raw data is touched exactly once, the tier-cascade claim for
    distinct counts."""
    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    day = hll_tier(ev, "user_id", tier="1d", ts="ts")
    month = hll_merge(day, "30d")
    est = hll_estimate(month)
    exact = ev.groupBy(
        bucket_start(F.col("ts"), "30d").alias("bucket_start")
    ).agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
    return est.join(exact, "bucket_start")


@_q(
    "kmv_anotb_audience",
    f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               AS hv
      FROM events WHERE user_id IS NOT NULL
    ), r AS (
      SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      FROM h
    ), s AS (
      SELECT event_type, list_sort(list(hv)) AS kmv
      FROM r WHERE rn <= {KMV_K} GROUP BY 1
    ), p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.kmv AS ka, b.kmv AS kb,
             LEAST(CASE WHEN len(a.kmv) < {KMV_K} THEN {_SPACE}
                        ELSE a.kmv[-1] END,
                   CASE WHEN len(b.kmv) < {KMV_K} THEN {_SPACE}
                        ELSE b.kmv[-1] END) AS theta
      FROM s a JOIN s b ON a.event_type <> b.event_type
    )
    SELECT type_a, type_b,
           CAST(len(ka) AS BIGINT) AS n_a,
           CAST(len(kb) AS BIGINT) AS n_b,
           theta,
           CAST(len(list_filter(ka,
                  h -> h < theta AND NOT list_contains(kb, h)))
                AS BIGINT) AS n_anotb,
           ROUND(CAST(len(list_filter(ka,
                   h -> h < theta AND NOT list_contains(kb, h)))
                 AS DOUBLE)
                 * {_SPACE}.0::DOUBLE / CAST(theta AS DOUBLE), 2)
             AS est_anotb
    FROM p
    """,
)
def kmv_anotb_audience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch A-not-B: estimated users doing event type A but
    never B, for every ordered type pair — the exclusivity complement of
    kmv_audience_intersection, from the SAME per-type sketches (one
    distinct-agg; the pair join moves only k-hash arrays). Sample =
    A-hashes below the pair theta and absent from B's sketch; estimate
    scales by space/theta. Asymmetric, so both (A,B) and (B,A) rows."""
    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    s = kmv_set(ev, "user_id", key_cols=("event_type",), k=KMV_K)
    a = s.select(F.col("event_type").alias("type_a"), F.col("kmv").alias("ka"))
    b = s.select(F.col("event_type").alias("type_b"), F.col("kmv").alias("kb"))
    p = a.join(F.broadcast(b), F.col("type_a") != F.col("type_b"))
    theta_a = F.when(F.size("ka") < KMV_K, F.lit(_SPACE)).otherwise(
        F.element_at("ka", -1)
    )
    theta_b = F.when(F.size("kb") < KMV_K, F.lit(_SPACE)).otherwise(
        F.element_at("kb", -1)
    )
    p = p.withColumn("theta", F.least(theta_a, theta_b))
    sample = F.size(
        F.filter(
            "ka",
            lambda h: (h < F.col("theta")) & ~F.array_contains(F.col("kb"), h),
        )
    )
    return p.select(
        "type_a", "type_b",
        F.size("ka").cast("long").alias("n_a"),
        F.size("kb").cast("long").alias("n_b"),
        "theta",
        sample.cast("long").alias("n_anotb"),
        F.round(
            sample.cast("double") * F.lit(float(_SPACE)) / F.col("theta").cast("double"),
            2,
        ).alias("est_anotb"),
    )


@_q(
    "cms_30d_merge_topfreq",
    f"""
    WITH e AS (
      SELECT {_B30_SQL} AS bucket_start, event_type FROM events
    ), sk AS (
      SELECT bucket_start, r,
             ('0x' || substring(md5(event_type || '|' || CAST(r AS VARCHAR)),
                                1, 15))::BIGINT % {CMS_WIDTH} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM e CROSS JOIN range({CMS_DEPTH}) t(r)
      GROUP BY 1, 2, 3
    ), probes AS (
      SELECT DISTINCT bucket_start, event_type FROM e
    ), pb AS (
      SELECT p.bucket_start, p.event_type, t.r,
             ('0x' || substring(md5(p.event_type || '|'
                                    || CAST(t.r AS VARCHAR)),
                                1, 15))::BIGINT % {CMS_WIDTH} AS bucket
      FROM probes p CROSS JOIN range({CMS_DEPTH}) t(r)
    ), est AS (
      SELECT pb.bucket_start, pb.event_type,
             CAST(MIN(COALESCE(sk.cnt, 0)) AS BIGINT) AS est
      FROM pb LEFT JOIN sk
        ON pb.bucket_start = sk.bucket_start AND pb.r = sk.r
       AND pb.bucket = sk.bucket
      GROUP BY 1, 2
    ), x AS (
      SELECT bucket_start, event_type, COUNT(*) AS exact_cnt
      FROM e GROUP BY 1, 2
    )
    SELECT est.bucket_start, est.event_type, est.est,
           CAST(x.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(est.est - x.exact_cnt AS BIGINT) AS overcount
    FROM est JOIN x
      ON est.bucket_start = x.bucket_start
     AND est.event_type = x.event_type
    """,
)
def cms_30d_merge_topfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type frequencies per 30d bucket read from DAY-tier
    Count-Min sketches summed upward (cms_merge: counters are sums —
    loss-free mergeable), probed for every observed type. The oracle
    sketches the 30d window directly; summed day counters must equal
    it exactly. overcount = est - exact >= 0 exhibits the CMS's
    one-sided error under collisions. Raw rows feed one day-keyed
    sketch agg (<= d*w rows per day out), the month fold moves only
    counters."""
    ev = load(spark, sf_dir, "events")
    items = ev.select(
        bucket_start(F.col("ts"), "1d").alias("day"),
        bucket_start(F.col("ts"), "30d").alias("bucket_start"),
        "event_type",
    )
    day_sk = cms_tier(items, "event_type", key_cols=("day", "bucket_start"))
    month_sk = cms_merge(day_sk.drop("day"), key_cols=("bucket_start",))
    probes = items.select("bucket_start", "event_type").distinct()
    est = cms_estimate(
        month_sk, probes, "event_type", key_cols=("bucket_start",)
    )
    exact = items.groupBy("bucket_start", "event_type").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    return est.join(exact, ["bucket_start", "event_type"]).select(
        "bucket_start", "event_type", "est",
        F.col("exact_cnt").cast("long").alias("exact_cnt"),
        (F.col("est") - F.col("exact_cnt")).cast("long").alias("overcount"),
    )
