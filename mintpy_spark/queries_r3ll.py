"""Round-3 batch ll: attribution, mode, and streaks.

- ``attribution_last_touch``: revenue attribution — each purchase joins
  the user's latest prior-or-same-instant click (the as-of join again,
  but driving a money aggregation); DuckDB's native ASOF LEFT JOIN is
  the oracle for the union + last(ignorenulls) window implementation.
- ``value_mode_daily``: exact mode of the cents distribution per day
  (most frequent value, smallest on ties) — max_by over a struct with
  inverted tie keys, one integer agg chain.
- ``activity_streaks``: longest run of CONSECUTIVE active days per user
  (gaps-and-islands: island id = day - dense rank), the classic
  sequence analysis every engagement stack ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load


@_q(
    "attribution_last_touch",
    """
    WITH clicks AS (
      SELECT user_id, ts FROM events
      WHERE event_type = 'click' AND user_id IS NOT NULL
    ), purchases AS (
      SELECT user_id, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL
        AND value IS NOT NULL
    ), j AS (
      SELECT p.user_id, p.cents, c.ts AS click_ts
      FROM purchases p
      ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND c.ts <= p.ts
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN click_ts IS NOT NULL THEN cents ELSE 0 END)
                AS BIGINT) AS attributed_cents,
           CAST(SUM(CASE WHEN click_ts IS NULL THEN cents ELSE 0 END)
                AS BIGINT) AS organic_cents,
           CAST(SUM(CASE WHEN click_ts IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_attributed
    FROM j GROUP BY 1
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution per user: purchase cents split into
    click-attributed vs organic by whether a click precedes the purchase
    (<= ties attribute, matching ASOF semantics). Implementation: union
    the two streams, one last(ignorenulls) window per user — a single
    shuffle, no self-join; DuckDB's native ASOF LEFT JOIN verifies it."""
    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(None).cast("long").alias("cents"),
        F.lit(1).alias("is_click"),
    )
    purchases = (
        ev.where(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .select(
            "user_id",
            "ts",
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
            F.lit(0).alias("is_click"),
        )
    )
    u = clicks.unionByName(purchases)
    # clicks sort BEFORE purchases at an equal timestamp (is_click DESC)
    # so a same-instant click attributes — the <= of the ASOF oracle
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.desc("is_click"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = u.withColumn(
        "click_ts",
        F.last(F.when(F.col("is_click") == 1, F.col("ts")), ignorenulls=True)
        .over(w),
    ).where(F.col("is_click") == 0)
    return tagged.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("click_ts").isNotNull(), F.col("cents")).otherwise(0)
        ).cast("long").alias("attributed_cents"),
        F.sum(
            F.when(F.col("click_ts").isNull(), F.col("cents")).otherwise(0)
        ).cast("long").alias("organic_cents"),
        F.sum(F.col("click_ts").isNotNull().cast("long")).cast("long").alias(
            "n_attributed"
        ),
    )


@_q(
    "value_mode_daily",
    """
    WITH c AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             COUNT(*) AS freq
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ), r AS (
      SELECT ed, cents, freq,
             row_number() OVER (PARTITION BY ed
                                ORDER BY freq DESC, cents ASC) AS rn
      FROM c
    )
    SELECT ed, cents AS mode_cents, freq AS mode_freq FROM r WHERE rn = 1
    """,
)
def value_mode_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact daily mode of the cents distribution (smallest value wins a
    frequency tie — deterministic cross-engine). Spark side: max_by over
    (freq, -cents) struct — no second window, the argmax folds in the
    same agg Exchange."""
    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    c = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("ed"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    ).agg(F.count(F.lit(1)).alias("freq"))
    best = c.groupBy("ed").agg(
        F.max_by(
            F.struct("cents", "freq"), F.struct(F.col("freq"), -F.col("cents"))
        ).alias("m")
    )
    return best.select(
        "ed", F.col("m.cents").alias("mode_cents"),
        F.col("m.freq").alias("mode_freq"),
    )


@_q(
    "activity_streaks",
    """
    WITH ud AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed
      FROM events WHERE user_id IS NOT NULL
    ), isl AS (
      SELECT user_id, ed,
             ed - row_number() OVER (PARTITION BY user_id ORDER BY ed)
               AS island
      FROM ud
    ), runs AS (
      SELECT user_id, island, COUNT(*) AS len,
             MIN(ed) AS start_ed
      FROM isl GROUP BY 1, 2
    ), best AS (
      SELECT user_id, len, start_ed,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY len DESC, start_ed ASC) AS rn
      FROM runs
    )
    SELECT user_id, len AS longest_streak, start_ed AS streak_start_ed,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM runs r2
             WHERE r2.user_id = best.user_id) AS n_streaks
    FROM best WHERE rn = 1
    """,
)
def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity run per user (gaps-and-islands:
    day minus in-order rank is constant within a run), earliest run wins
    a length tie. One distinct agg + one window + one island agg — all
    on the same user_id clustering, a single Exchange end-to-end."""
    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    ud = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("ed"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("ed")
    isl = ud.withColumn("island", F.col("ed") - F.row_number().over(w))
    runs = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"), F.min("ed").alias("start_ed")
    )
    best = runs.groupBy("user_id").agg(
        F.max_by(
            F.struct("len", "start_ed"),
            F.struct(F.col("len"), -F.col("start_ed")),
        ).alias("m"),
        F.count(F.lit(1)).alias("n_streaks"),
    )
    return best.select(
        "user_id",
        F.col("m.len").alias("longest_streak"),
        F.col("m.start_ed").alias("streak_start_ed"),
        "n_streaks",
    )
