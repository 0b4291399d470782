"""Round-3 additions, batch o: inverted-index build statistics, SCD2
state tracking with point-in-time snapshot, and weekly cohort retention.

Three more workload classes a web-corpus/event platform runs daily,
each pure Catalyst with an exact DuckDB oracle: IR index construction
(postings lists + fingerprints), slowly-changing-dimension row
versioning (the row-level counterpart of the tier store's snapshot time
travel), and product-analytics cohort analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.functions.scalars import nonempty_tokens
from mintpy_spark.queries import _q, load

_SNAP_TS = "2024-01-15 00:00:00"


@_q(
    "index_postings_stats",
    """
    WITH occ AS (
      SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS occ
      FROM (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        FROM documents)
      GROUP BY tok, doc_id
    )
    SELECT tok,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(occ) AS BIGINT) AS cf,
           ('0x' || substring(md5(string_agg(CAST(doc_id AS VARCHAR), ','
                                             ORDER BY doc_id)), 1, 15))::BIGINT
             AS postings_fp
    FROM occ
    GROUP BY tok
    ORDER BY df DESC, tok ASC
    LIMIT 30
    """,
)
def index_postings_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: per-token document frequency, collection
    frequency, and a fingerprint of the doc_id-sorted postings list (the
    value an index-shard writer would checksum), top-30 by df. Plan: one
    explode, two hash-aggs with map-side partials; postings are collected
    per token AFTER the (tok, doc_id) pre-agg so list size is bounded by
    df, not cf. At 10^12 docs the stopword tokens' postings dominate —
    production would range-shard each hot token's postings by doc_id
    block (the bucketed-table layout in sources/bucketed.py); the
    fingerprint composes over blocks via the same md5-of-concat chain."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(nonempty_tokens(F.col("text"))).alias("tok"),
    )
    occ = toks.groupBy("tok", "doc_id").agg(F.count("*").alias("occ"))
    ids = F.concat_ws(
        ",", F.transform(F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string"))
    )
    fp = F.conv(F.substring(F.md5(F.encode(ids, "UTF-8")), 1, 15), 16, 10).cast("long")
    return (
        occ.groupBy("tok")
        .agg(
            F.count("*").alias("df"),
            F.sum("occ").alias("cf"),
            fp.alias("postings_fp"),
        )
        .orderBy(F.desc("df"), F.asc("tok"))
        .limit(30)
    )


@_q(
    "scd2_snapshot",
    f"""
    WITH scd AS (
      SELECT user_id, value, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM events
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS scd_rows,
      CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS open_rows,
      CAST(SUM(CASE WHEN valid_from <= TIMESTAMP '{_SNAP_TS}'
                     AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_SNAP_TS}')
                    THEN 1 ELSE 0 END) AS BIGINT) AS snap_users,
      CAST(SUM(CASE WHEN valid_from <= TIMESTAMP '{_SNAP_TS}'
                     AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_SNAP_TS}')
                    THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS snap_value_cents
    FROM scd
    """,
)
def scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 row versioning over the event stream (each user's value
    is valid from its event until the user's next event) plus a
    point-in-time snapshot at 2024-01-15: how many users had live state
    and the exact sum of their values in integer cents. The row-level
    counterpart of the tier store's snapshot time travel
    (sources/tables.py) — LEAD over (user ORDER BY ts, event_id) builds
    the validity intervals in one window pass; the deterministic
    event_id tie-break makes the intervals engine- and
    partitioning-exact. Snapshot predicates prune to one partition range
    on a valid_from-partitioned SCD table at scale."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    scd = ev.select(
        "user_id", "value", F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    t = F.lit(_SNAP_TS).cast("timestamp")
    live = (F.col("valid_from") <= t) & (
        F.col("valid_to").isNull() | (F.col("valid_to") > t)
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return scd.agg(
        F.count("*").alias("scd_rows"),
        F.sum(F.when(F.col("valid_to").isNull(), 1).otherwise(0)).alias("open_rows"),
        F.sum(F.when(live, 1).otherwise(0)).alias("snap_users"),
        F.sum(F.when(live, cents).otherwise(F.lit(0))).alias("snap_value_cents"),
    )


@_q(
    "cohort_retention_weekly",
    """
    WITH c AS (
      SELECT user_id,
             CAST(floor(date_diff('day', DATE '2024-01-01',
                                  CAST(MIN(ts) AS DATE)) / 7) AS BIGINT)
               AS cohort_week
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), act AS (
      SELECT DISTINCT c.cohort_week,
             CAST(floor(date_diff('day', DATE '2024-01-01',
                                  CAST(e.ts AS DATE)) / 7) AS BIGINT)
               AS activity_week,
             e.user_id
      FROM events e JOIN c ON c.user_id = e.user_id
    )
    SELECT cohort_week, activity_week, CAST(COUNT(*) AS BIGINT) AS users
    FROM act GROUP BY cohort_week, activity_week
    """,
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by first-signup
    week, counted in every week they show any activity — the triangle
    chart behind every retention dashboard. Exact integer week indices
    (floor(days/7) anchored at the epoch start). Plan: signup agg on
    user_id, then one join (cohorts are a projection of the same key, so
    on user-bucketed layouts it's co-located), distinct, count."""
    ev = load(spark, sf_dir, "events")
    day0 = F.lit("2024-01-01").cast("date")
    c = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(
            F.floor(F.datediff(F.to_date(F.min("ts")), day0) / 7)
            .cast("long")
            .alias("cohort_week")
        )
    )
    act = (
        ev.join(c, "user_id")
        .select(
            "cohort_week",
            F.floor(F.datediff(F.to_date("ts"), day0) / 7)
            .cast("long")
            .alias("activity_week"),
            "user_id",
        )
        .distinct()
    )
    return act.groupBy("cohort_week", "activity_week").agg(
        F.count("*").alias("users")
    )
