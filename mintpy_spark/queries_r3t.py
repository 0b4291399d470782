"""Round-3 additions, batch t: HDR log-bucketed quantile-sketch tier,
Markov event-transition census, and a diurnal-concentration entropy
audit.

The HDR sketch is the production percentile tier (HdrHistogram /
DDSketch family): log2 buckets give bounded RELATIVE error across the
full dynamic range with no a-priori [lo, hi) choice — the fixed-width
histogram tier (operators/rollup.histogram_tier) clips whatever range it
wasn't sized for, which is fatal for latency/size p99s. Bucketing is
exact integer arithmetic, so unlike DDSketch's log-gamma the WHOLE
sketch is oracle-checkable bit-for-bit, and the Spark side deliberately
builds 1d sketches by MERGING 1h sketches while the oracle builds them
directly from raw rows — the driver hash-check is therefore a proof of
loss-free mergeability (same design as the KMV tier oracle).

The transition census is first-order Markov structure over per-user
event streams (the sequence-analytics staple); the diurnal entropy is
the hour-of-day concentration diagnostic (bots are metronomic — low
entropy; organic traffic is spread — high entropy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.operators.sketch import hdr_merge, hdr_quantiles, hdr_tier
from mintpy_spark.queries import _q, load

# shared SQL fragment: the HDR bucket of a positive BIGINT at
# sub_bits=3 (s = max(bitlength-4, 0)) — EXACT integer shifts, valid
# over the full BIGINT range (a double-based floor(v/2^s)*2^s breaks
# at v >= 2^53: the double cast rounds, pushing the bucket edge above
# the value, and the top octave overflows the BIGINT cast)
_HDR_BUCKET_SQL = """
  CASE WHEN cents <= 0 THEN 0
       ELSE (cents >> greatest(length(bin(cents)) - 4, 0))
            << greatest(length(bin(cents)) - 4, 0)
  END
"""


@_q(
    "rollup_1d_hdr_quantiles",
    f"""
    WITH obs AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ), sk AS (
      SELECT day, {_HDR_BUCKET_SQL} AS bucket, COUNT(*) AS cnt
      FROM obs GROUP BY 1, 2
    ), c AS (
      SELECT day, bucket,
             SUM(cnt) OVER (PARTITION BY day ORDER BY bucket) AS cum,
             SUM(cnt) OVER (PARTITION BY day) AS tot
      FROM sk
    ), hit AS (
      SELECT day, q, MIN(bucket) AS qa
      FROM c CROSS JOIN (SELECT unnest([0.50, 0.95, 0.99]) AS q)
      WHERE cum >= ceil(q * tot)
      GROUP BY 1, 2
    ), ex AS (
      SELECT day, quantile_cont(cents, 0.95) AS exact_p95
      FROM obs GROUP BY 1
    )
    SELECT hit.day,
           CAST(MAX(CASE WHEN q = 0.50 THEN qa END) AS BIGINT) AS p50,
           CAST(MAX(CASE WHEN q = 0.95 THEN qa END) AS BIGINT) AS p95,
           CAST(MAX(CASE WHEN q = 0.99 THEN qa END) AS BIGINT) AS p99,
           round(MAX(ex.exact_p95), 4) AS exact_p95
    FROM hit JOIN ex USING (day)
    GROUP BY hit.day
    """,
)
def rollup_1d_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day p50/p95/p99 of integer-cents values from the HDR sketch
    tier, next to the exact p95 (the accuracy report: the sketch value
    is within 2^-3 relative error of it). The Spark plan builds 1h
    sketches and MERGES them to 1d — hash-matching the oracle's
    direct-from-raw build proves the cascade loses nothing.

    Plan: one pruned scan -> (day, hour, bucket) hash agg with map-side
    combine -> tiny merge agg -> ONE cumulative window over <=512
    buckets/day with all three quantiles as conditional MINs
    (hdr_quantiles) -> join with the exact-percentile agg; at 10^12
    rows only the sketch agg and the exact agg touch raw data, and the
    sketch Exchange carries at most days*24*512 rows."""
    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    obs = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    sk_1h = hdr_tier(obs, "cents", key_cols=("day", "hour"))
    sk_1d = hdr_merge(sk_1h.drop("hour"), key_cols=("day",))
    ps = hdr_quantiles(
        sk_1d, {"p50": 0.50, "p95": 0.95, "p99": 0.99}, key_cols=("day",)
    )
    exact = obs.groupBy("day").agg(
        F.round(F.percentile(F.col("cents"), F.lit(0.95)), 4).alias(
            "exact_p95"
        )
    )
    return ps.join(exact, "day").select(
        "day", "p50", "p95", "p99", "exact_p95"
    )


@_q(
    "event_transition_top",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ), pairs AS (
      SELECT event_type AS prev_type, next_type, COUNT(*) AS cnt
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ), tot AS (
      SELECT prev_type, SUM(cnt) AS tot FROM pairs GROUP BY 1
    ), ranked AS (
      SELECT p.prev_type, p.next_type, p.cnt,
             CAST(floor(p.cnt * 10000.0 / t.tot + 0.5) AS BIGINT)
               AS prob_bp,
             row_number() OVER (PARTITION BY p.prev_type
                                ORDER BY p.cnt DESC, p.next_type ASC)
               AS rn
      FROM pairs p JOIN tot t USING (prev_type)
    )
    SELECT prev_type, next_type, CAST(cnt AS BIGINT) AS cnt, prob_bp
    FROM ranked WHERE rn <= 3
    """,
)
def event_transition_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition census: per event_type, the top-3
    next event types across all per-user streams, with exact counts and
    integer basis-point transition probabilities (deterministic order:
    ts then event_id within a user; count desc then next_type for the
    rank). Plan: one window pass keyed on user (the same Exchange every
    sessionization query pays) -> tiny (prev, next) hash agg -> rank
    over an |event_type|^2-bounded table."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .where(F.col("next_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w_tot = Window.partitionBy("prev_type")
    ranked = (
        pairs.withColumn(
            "prob_bp",
            F.floor(
                F.col("cnt") * F.lit(10000.0) / F.sum("cnt").over(w_tot)
                + F.lit(0.5)
            ).cast("long"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("prev_type").orderBy(
                    F.col("cnt").desc(), F.col("next_type").asc()
                )
            ),
        )
    )
    return ranked.where(F.col("rn") <= 3).select(
        "prev_type", "next_type", "cnt", "prob_bp"
    )


@_q(
    "diurnal_entropy",
    """
    WITH h AS (
      SELECT event_type, CAST(hour(ts) AS INT) AS hod, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ), t AS (
      SELECT event_type, SUM(cnt) AS tot FROM h GROUP BY 1
    ), pk AS (
      SELECT event_type, hod AS peak_hour
      FROM (SELECT event_type, hod,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY cnt DESC, hod ASC) AS rn
            FROM h)
      WHERE rn = 1
    )
    SELECT h.event_type,
           CAST(MAX(t.tot) AS BIGINT) AS n_events,
           CAST(MAX(pk.peak_hour) AS INT) AS peak_hour,
           round(-SUM((CAST(h.cnt AS DOUBLE) / t.tot)
                      * ln(CAST(h.cnt AS DOUBLE) / t.tot)), 4) AS entropy
    FROM h JOIN t USING (event_type) JOIN pk USING (event_type)
    GROUP BY h.event_type
    """,
)
def diurnal_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day concentration per event_type: Shannon entropy of the
    24-bin diurnal histogram (metronomic/bot-like traffic scores low,
    organic traffic high) plus the peak hour (deterministic tie: the
    smallest hour). One pruned scan -> 24-row-per-type hash agg; the
    entropy folds over at most 24 terms per type."""
    ev = load(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hod")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_tot = Window.partitionBy("event_type")
    w_rank = Window.partitionBy("event_type").orderBy(
        F.col("cnt").desc(), F.col("hod").asc()
    )
    p = F.col("cnt").cast("double") / F.col("tot")
    return (
        h.withColumn("tot", F.sum("cnt").over(w_tot))
        .withColumn("rn", F.row_number().over(w_rank))
        .groupBy("event_type")
        .agg(
            F.max("tot").cast("long").alias("n_events"),
            F.max(F.when(F.col("rn") == 1, F.col("hod")))
            .cast("int")
            .alias("peak_hour"),
            F.round(-F.sum(p * F.log(p)), 4).alias("entropy"),
        )
    )
