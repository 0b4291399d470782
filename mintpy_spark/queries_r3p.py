"""Round-3 additions, batch p: two-series LOCF alignment join, one-pass
column profiling, and calendar-month rollup.

The alignment join is the kdb `aj`/InfluxDB-join primitive the as-of
family doesn't cover (BOTH series carried forward onto the union of
their timestamps); the profiler is the materialized form of the
reference's info.py metadata inspection; the calendar rollup is the
variable-length-bucket counterpart of the engine's fixed-width tiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load


@_q(
    "series_align_locf",
    """
    WITH u AS (
      SELECT user_id, ts, event_id, 0 AS src, value AS va, NULL::DOUBLE AS vb
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, event_id, 1 AS src, NULL::DOUBLE AS va, value AS vb
      FROM events WHERE event_type = 'purchase'
    ), f AS (
      SELECT user_id,
             last_value(va IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, src, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fa,
             last_value(vb IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, src, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fb
      FROM u
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      CAST(SUM(CASE WHEN fa IS NOT NULL AND fb IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_both,
      CAST(SUM(CASE WHEN fa IS NOT NULL AND fb IS NOT NULL
                    THEN CAST(floor(fa * 100 + 0.5) AS BIGINT)
                         - CAST(floor(fb * 100 + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS diff_cents_sum
    FROM f
    """,
)
def series_align_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Align two per-user value series (click vs purchase) on the UNION of
    their timestamps, carrying each side forward — the kdb `aj` / pandas
    combine_first primitive: at every observation of either stream, the
    most recent value of BOTH streams. The engine's as-of joins probe one
    side; this materializes the merged timeline. Deterministic ordering
    (ts, src, event_id) makes the ignore-nulls carry exact under any
    partitioning; values quantize to integer cents at the row level so
    the aligned-difference checksum is order-free. Plan: union of two
    pruned scans, ONE shuffle on user_id feeding both window passes and
    the final agg."""
    ev = load(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.lit(0).alias("src"),
        F.col("value").alias("va"), F.lit(None).cast("double").alias("vb"),
    )
    b = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("src"),
        F.lit(None).cast("double").alias("va"), F.col("value").alias("vb"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "src", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    f = a.unionAll(b).select(
        "user_id",
        F.last("va", ignorenulls=True).over(w).alias("fa"),
        F.last("vb", ignorenulls=True).over(w).alias("fb"),
    )
    both = F.col("fa").isNotNull() & F.col("fb").isNotNull()
    cents = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("long")  # noqa: E731
    return f.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.when(both, 1).otherwise(0)).alias("n_both"),
        F.sum(F.when(both, cents("fa") - cents("fb")).otherwise(F.lit(0)))
        .alias("diff_cents_sum"),
    )


_PROFILE_COLS = (
    # (name, kind) — numeric columns profile min/max as doubles; ts as
    # epoch microseconds (string formatting of timestamps is not
    # engine-portable); strings as binary-collation min/max
    ("event_id", "num"),
    ("ts", "ts"),
    ("user_id", "num"),
    ("event_type", "str"),
    ("value", "num"),
    ("props", "str"),
)


def _profile_oracle() -> str:
    parts = []
    for name, kind in _PROFILE_COLS:
        if kind == "num":
            mn = f"CAST(MIN({name}) AS DOUBLE)"
            mx = f"CAST(MAX({name}) AS DOUBLE)"
            ms, xs = "NULL::VARCHAR", "NULL::VARCHAR"
        elif kind == "ts":
            mn = f"CAST(epoch_us(MIN({name})) AS DOUBLE)"
            mx = f"CAST(epoch_us(MAX({name})) AS DOUBLE)"
            ms, xs = "NULL::VARCHAR", "NULL::VARCHAR"
        else:
            mn, mx = "NULL::DOUBLE", "NULL::DOUBLE"
            ms, xs = f"MIN({name})", f"MAX({name})"
        parts.append(
            f"SELECT '{name}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n,"
            f" CAST(COUNT(*) - COUNT({name}) AS BIGINT) AS nulls,"
            f" CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct,"
            f" {mn} AS min_num, {mx} AS max_num,"
            f" {ms} AS min_str, {xs} AS max_str FROM events"
        )
    return " UNION ALL ".join(parts)


@_q("profile_events_columns", _profile_oracle())
def profile_events_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column dataset profile of the events table — count, null count,
    exact distinct count, typed min/max (numerics and timestamps as
    doubles/epoch-µs, strings under binary collation) — the materialized
    info.py/describe() every ingestion pipeline snapshots per partition
    drop. Spark side is ONE scan: a single aggregate computes every
    metric, then `stack()` pivots the row to one row per column (the
    oracle's UNION-ALL-of-aggregates spelling scans per column; at 100 TB
    the one-pass form is the only viable one — distinct counts would
    downgrade to the KMV sketch tier in operators/sketch.py)."""
    ev = load(spark, sf_dir, "events")
    aggs, stack_args = [], []
    for name, kind in _PROFILE_COLS:
        c = F.col(name)
        aggs += [
            F.count("*").alias(f"{name}__n"),
            (F.count("*") - F.count(c)).alias(f"{name}__nulls"),
            F.countDistinct(c).alias(f"{name}__nd"),
        ]
        if kind == "num":
            aggs += [F.min(c).cast("double").alias(f"{name}__mn"),
                     F.max(c).cast("double").alias(f"{name}__mx")]
        elif kind == "ts":
            aggs += [
                F.unix_micros(F.min(c).cast("timestamp")).cast("double")
                .alias(f"{name}__mn"),
                F.unix_micros(F.max(c).cast("timestamp")).cast("double")
                .alias(f"{name}__mx"),
            ]
        if kind in ("num", "ts"):
            stack_args.append(
                f"'{name}', {name}__n, {name}__nulls, {name}__nd,"
                f" {name}__mn, {name}__mx, CAST(NULL AS STRING),"
                f" CAST(NULL AS STRING)"
            )
        else:
            aggs += [F.min(c).alias(f"{name}__mns"), F.max(c).alias(f"{name}__mxs")]
            stack_args.append(
                f"'{name}', {name}__n, {name}__nulls, {name}__nd,"
                f" CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),"
                f" {name}__mns, {name}__mxs"
            )
    one = ev.agg(*aggs)
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, "
            + ", ".join(stack_args)
            + ") AS (col_name, n, nulls, n_distinct, min_num, max_num,"
            " min_str, max_str)"
        )
    )


@_q(
    "olap_monthly_orders",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(COUNT(*) AS BIGINT) AS orders,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS customers
    FROM orders
    GROUP BY 1
    """,
)
def olap_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month rollup over six years of orders — the
    variable-length-bucket counterpart of the engine's fixed-width tiers
    (28/29/30/31-day buckets cannot be expressed as an epoch-anchored
    width; date_trunc IS the bucket function). Revenue in exact integer
    cents; one hash agg with map-side partials."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_trunc("month", F.col("o_orderdate").cast("timestamp"))
            .alias("month_start")
        )
        .agg(
            F.count("*").alias("orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .alias("revenue_cents"),
            F.countDistinct("o_custkey").alias("customers"),
        )
    )
