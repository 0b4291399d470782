"""Round-3 driver queries: M4 downsampling, KMV distinct sketch tiers,
counter-reset increase, sliding continuous aggregates, residual
autocorrelation, and JSON-ish metadata extraction.

Same oracle discipline as mintpy_spark.queries (identical aliases,
in-query rounding on both sides, integer arithmetic wherever the payload
allows — see the memory'd parity recipes cited inline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.functions.timefn import decimal_year
from mintpy_spark.queries import _DY_SQL, _q, _round4, load

KMV_K = 32
KMV_SPACE = 16**15  # md5 15-hex-digit prefix space


@_q(
    "downsample_m4",
    """
    SELECT user_id, bucket_start,
           MIN(CASE WHEN rn_a = 1 THEN value END) AS v_first,
           MIN(value) AS v_min,
           MAX(value) AS v_max,
           MIN(CASE WHEN rn_d = 1 THEN value END) AS v_last,
           COUNT(value) AS cnt
    FROM (
      SELECT user_id, value,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
             row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts, value) AS rn_a,
             row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts DESC, value DESC) AS rn_d
      FROM events)
    GROUP BY 1, 2
    """,
)
def downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 visualization downsampling (Jugel et al. VLDB'14): per series
    per day keep first/min/max/last — the four values that render the raw
    line pixel-exactly at daily resolution. One hash agg, no window on
    the Spark side; ties on the timestamp break toward the smaller value
    in both engines (struct-min vs ORDER BY ts, value)."""
    from mintpy_spark.operators.downsample import m4_downsample

    ev = load(spark, sf_dir, "events")
    out = m4_downsample(ev, "value", tier="1d", key="user_id", ts="ts")
    return out.select(
        "user_id", "bucket_start", "v_first", "v_min", "v_max", "v_last", "cnt"
    )


@_q(
    "rollup_1d_distinct_kmv",
    f"""
    WITH h AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
      FROM events WHERE user_id IS NOT NULL),
    r AS (
      SELECT bucket_start, hv,
             row_number() OVER (PARTITION BY bucket_start ORDER BY hv) AS rn
      FROM h)
    SELECT bucket_start,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           MAX(hv)                  AS kth_min,
           CASE WHEN COUNT(*) < {KMV_K} THEN CAST(COUNT(*) AS DOUBLE)
                ELSE ROUND({KMV_K - 1}.0::DOUBLE * {KMV_SPACE}.0::DOUBLE
                           / CAST(MAX(hv) AS DOUBLE), 2)
           END AS est_distinct
    FROM r WHERE rn <= {KMV_K} GROUP BY 1
    """,
)
def rollup_1d_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per day via a KMV sketch tier, with the 1d sketch
    built by MERGING per-hour sketches (operators/sketch.py). The oracle
    computes the same sketch directly from raw rows — equality is the
    KMV merge theorem (k smallest of a union == k smallest of the merged
    k-smallest partials), so the tier-merge path is provably lossless;
    only the final estimate is approximate."""
    from mintpy_spark.operators.sketch import kmv_estimate, kmv_merge, kmv_tier

    ev = load(spark, sf_dir, "events")
    s1h = kmv_tier(ev, "user_id", tier="1h", key_cols=(), ts="ts", k=KMV_K)
    s1d = kmv_merge(s1h, "1d", key_cols=(), k=KMV_K)
    out = kmv_estimate(s1d, k=KMV_K)
    return out.select(
        "bucket_start",
        F.col("n_kept").cast("long").alias("n_kept"),
        "kth_min",
        "est_distinct",
    )


@_q(
    "counter_increase_1d",
    """
    WITH c AS (
      SELECT user_id, ts,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER
               (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) % 100000 AS ctr
      FROM events),
    d AS (
      SELECT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
             CASE WHEN prev IS NULL THEN NULL
                  WHEN ctr >= prev THEN ctr - prev
                  ELSE ctr END AS dd,
             CASE WHEN prev IS NULL THEN NULL
                  WHEN ctr < prev THEN 1 ELSE 0 END AS rst
      FROM (SELECT user_id, ts, ctr,
                   lag(ctr) OVER (PARTITION BY user_id ORDER BY ts) AS prev
            FROM c WHERE ctr IS NOT NULL))
    SELECT user_id, bucket_start,
           CAST(SUM(dd) AS BIGINT)  AS increase,
           CAST(SUM(rst) AS BIGINT) AS n_resets,
           COUNT(*) AS n_samples
    FROM d GROUP BY 1, 2
    """,
)
def counter_increase_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL-style increase() per day over a wrapping cumulative counter
    (reset-aware deltas; operators/counter.py). The counter is synthesized
    deterministically from the events values in INTEGER cents (cumsum %
    100000) so both engines agree bit-exactly — order-dependent float
    cumsums across engines are a parity trap (DuckDB windows use segment
    trees; integer sums are order-free)."""
    from mintpy_spark.operators.counter import counter_increase

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cents = F.round(F.col("value") * 100).cast("long")
    ctr = (F.sum(cents).over(w) % 100000).alias("ctr")
    series = ev.select("user_id", "ts", ctr)
    out = counter_increase(series, "ctr", tier="1d", key="user_id", ts="ts")
    return out.select(
        "user_id", "bucket_start", "increase",
        F.col("n_resets").cast("long").alias("n_resets"), "n_samples",
    )


@_q(
    "rollup_7d_sliding",
    """
    WITH t AS (
      SELECT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
             CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS bucket_no,
             COUNT(value) AS cnt, SUM(value) AS vsum,
             MIN(value) AS vmin, MAX(value) AS vmax
      FROM events GROUP BY 1, 2, 3)
    SELECT user_id, bucket_start,
           CAST(SUM(cnt) OVER w AS BIGINT)  AS w_cnt,
           ROUND(SUM(vsum) OVER w, 2)       AS w_vsum,
           MIN(vmin) OVER w                 AS w_vmin,
           MAX(vmax) OVER w                 AS w_vmax
    FROM t
    WINDOW w AS (PARTITION BY user_id ORDER BY bucket_no
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def rollup_7d_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day sliding aggregates computed FROM the stored 1d tier
    partials (continuous-aggregate read path, operators/downsample.py):
    at scale this reads tier rows, not raw history. Integer bucket-number
    range frame — exact and engine-portable (timestamp interval frames
    are a microsecond-precision trap)."""
    from mintpy_spark.operators.downsample import sliding_from_tier
    from mintpy_spark.operators.rollup import rollup_from_obs

    ev = load(spark, sf_dir, "events")
    t1d = rollup_from_obs(ev, "value", "1d", key="user_id", ts="ts")
    out = sliding_from_tier(t1d, tier="1d", trailing=7, key="user_id")
    return out.select(
        "user_id", "bucket_start",
        "w_cnt", F.round("w_vsum", 2).alias("w_vsum"), "w_vmin", "w_vmax",
    )


@_q(
    "residual_acf1",
    f"""
    WITH b AS (
      SELECT user_id, ts, value, {_DY_SQL.format(t='ts')} - 2024.0 AS t
      FROM events),
    f AS (
      SELECT user_id,
             covar_pop(t, value) / var_pop(t) AS slope,
             AVG(value) - covar_pop(t, value) / var_pop(t) * AVG(t) AS icept
      FROM b GROUP BY user_id),
    r AS (
      SELECT b.user_id, b.ts, b.value - (f.icept + f.slope * b.t) AS resid
      FROM b JOIN f ON b.user_id = f.user_id),
    p AS (
      SELECT user_id, resid,
             lag(resid) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      FROM r)
    SELECT user_id,
           ROUND(corr(resid, prev), 4) AS acf1,
           CAST(COUNT(prev) AS BIGINT) AS n_pairs
    FROM p GROUP BY user_id
    """,
)
def residual_acf1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the linear-fit residuals per series — the
    temporal-noise diagnostic behind the reference's residual RMS /
    noise-evaluation step (timeseries_rms analog): white residuals give
    acf1 ~ 0, unmodeled temporal structure pushes it positive. Fit is the
    closed-form OLS (operators/timefunc.linear_velocity), residuals via a
    broadcast join of the tiny per-key fit table, one lag window, one agg."""
    from mintpy_spark.operators.timefunc import linear_velocity

    ev = load(spark, sf_dir, "events")
    fit = linear_velocity(ev, "value", key="user_id", ts="ts", ref_year=2024.0)
    t = decimal_year(F.col("ts")) - F.lit(2024.0)
    j = ev.select("user_id", "ts", "value", t.alias("t")).join(
        F.broadcast(fit.select("user_id", "velocity", "intercept")), "user_id"
    )
    r = j.select(
        "user_id", "ts",
        (F.col("value") - (F.col("intercept") + F.col("velocity") * F.col("t"))).alias(
            "resid"
        ),
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    p = r.withColumn("prev", F.lag("resid").over(w))
    return p.groupBy("user_id").agg(
        _round4(F.corr("resid", "prev")).alias("acf1"),
        F.count("prev").alias("n_pairs"),
    )


@_q(
    "props_extract_stats",
    """
    SELECT event_type,
           CAST(COUNT(k) AS BIGINT) AS n_with_k,
           CAST(SUM(k) AS BIGINT)   AS k_sum,
           MIN(k) AS k_min, MAX(k) AS k_max
    FROM (
      SELECT event_type,
             CAST(NULLIF(regexp_extract(props, '"k":\\s*(\\d+)', 1), '') AS BIGINT) AS k
      FROM events)
    GROUP BY event_type
    """,
)
def props_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured metadata extraction: pull the integer ``k`` field
    out of the JSON-ish ``props`` payload with a regex (the web-pipeline
    sidecar-metadata pattern; all-integer aggregates, zero float risk).
    Both engines run the same RE2/Java-compatible pattern; no-match maps
    to NULL via NULLIF('') on both sides."""
    ev = load(spark, sf_dir, "events")
    k_str = F.regexp_extract("props", r'"k":\s*(\d+)', 1)
    k = F.when(k_str != "", k_str.cast("long"))
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )
