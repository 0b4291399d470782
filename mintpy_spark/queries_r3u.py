"""Round-3 additions, batch u: presence-bitmap tier, audience-overlap
Jaccard, discrete conversion hazard, and a Gini concentration audit.

* presence bitmap — the Druid/ClickHouse-style bitmap tier: per-user day
  presence as OR-mergeable int64 masks (operators/bitmap.py). The Spark
  side deliberately builds the tier from two disjoint halves of the
  stream and MERGES them while the oracle builds directly from raw rows,
  so the driver hash-check proves the loss-free (and replay-idempotent)
  merge — the KMV/HDR oracle design.
* audience overlap — exact |A∩B| / Jaccard between event-type audiences;
  the corpus-mixing overlap audit (how much do two sources/streams share
  users) done as one distinct pass + a key-colocated self-join.
* conversion hazard — discrete-time hazard of first purchase after first
  click (the Kaplan-Meier numerator/denominator without censoring),
  exact integer counts with basis-point rates.
* Gini concentration — is the stream dominated by few users? The Spark
  plan is the SCALE-SAFE count-histogram form (tie-block closed form
  over distinct count values); the oracle is the independent naive
  row_number formulation, so the hash match proves the closed form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.operators.bitmap import (
    active_days,
    epoch_day,
    presence_merge,
    presence_tier,
)
from mintpy_spark.queries import _q, load


@_q(
    "presence_bitmap_60d",
    """
    WITH d AS (
      SELECT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed
      FROM events
    )
    SELECT user_id,
           CAST(ed // 60 AS BIGINT) AS block,
           bit_or(1::BIGINT << CAST(ed % 60 AS INT)) AS bitmap,
           CAST(bit_count(bit_or(1::BIGINT << CAST(ed % 60 AS INT)))
                AS INT) AS active_days,
           CAST(min(ed) AS BIGINT) AS d_min,
           CAST(max(ed) AS BIGINT) AS d_max
    FROM d GROUP BY 1, 2
    """,
)
def presence_bitmap_60d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 60-day presence bitmaps with popcount active-day counts.
    The Spark plan tiers two disjoint halves of the stream (event_id
    parity) and bit_or-MERGES them; the oracle builds each mask straight
    from raw — hash equality proves the merge loses nothing. Plan: two
    pruned scans -> hash aggs with map-side combine -> tiny merge agg;
    every Exchange carries (user, block) rows only, ~1/60th of the
    day-level row count and independent of per-day event volume."""
    ev = load(spark, sf_dir, "events")
    even = presence_tier(ev.where(F.col("event_id") % 2 == 0))
    odd = presence_tier(ev.where(F.col("event_id") % 2 == 1))
    merged = presence_merge(even.unionByName(odd))
    return merged.select(
        "user_id",
        "block",
        "bitmap",
        active_days().alias("active_days"),
        "d_min",
        "d_max",
    )


@_q(
    "audience_overlap_jaccard",
    """
    WITH a AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), t AS (
      SELECT event_type, COUNT(*) AS n FROM a GROUP BY 1
    ), inter AS (
      SELECT x.event_type AS type_a, y.event_type AS type_b,
             COUNT(*) AS n_inter
      FROM a x JOIN a y
        ON x.user_id = y.user_id AND x.event_type < y.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b,
           CAST(ta.n AS BIGINT) AS n_a,
           CAST(tb.n AS BIGINT) AS n_b,
           CAST(i.n_inter AS BIGINT) AS n_inter,
           CAST(floor(i.n_inter * 10000.0
                      / (ta.n + tb.n - i.n_inter) + 0.5) AS BIGINT)
             AS jaccard_bp
    FROM inter i
    JOIN t ta ON ta.event_type = i.type_a
    JOIN t tb ON tb.event_type = i.type_b
    """,
)
def audience_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact audience overlap between event types: |A∩B|, |A|, |B| and
    integer basis-point Jaccard for every type pair sharing at least one
    user. Plan: one distinct pass keyed (type, user) -> self-join
    CO-LOCATED on user_id (the same Exchange), exploding each user into
    at most |types|-choose-2 pairs (bounded by type cardinality, not
    data volume) -> tiny pair agg -> broadcast joins against the 5-row
    per-type totals."""
    ev = load(spark, sf_dir, "events")
    a = ev.select("event_type", "user_id").distinct()
    t = a.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    x, y = a.alias("x"), a.alias("y")
    inter = (
        x.join(
            y,
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    ta = F.broadcast(t.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a")))
    tb = F.broadcast(t.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b")))
    uni = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    return (
        inter.join(ta, "type_a")
        .join(tb, "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            "n_inter",
            F.floor(F.col("n_inter") * F.lit(10000.0) / uni + F.lit(0.5))
            .cast("long")
            .alias("jaccard_bp"),
        )
    )


@_q(
    "conversion_hazard_daily",
    """
    WITH fc AS (
      SELECT user_id, min(ts) AS click_ts FROM events
      WHERE event_type = 'click' GROUP BY 1
    ), fp AS (
      SELECT e.user_id, min(e.ts) AS purch_ts
      FROM events e JOIN fc ON e.user_id = fc.user_id
      WHERE e.event_type = 'purchase' AND e.ts > fc.click_ts
      GROUP BY 1
    ), conv AS (
      SELECT date_diff('day', CAST(fc.click_ts AS DATE),
                       CAST(fp.purch_ts AS DATE)) AS d,
             COUNT(*) AS n_conv
      FROM fc JOIN fp ON fc.user_id = fp.user_id
      GROUP BY 1
    ), tot AS (SELECT COUNT(*) AS n FROM fc),
    haz AS (
      SELECT d, n_conv,
             (SELECT n FROM tot)
               - COALESCE(SUM(n_conv) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS at_risk
      FROM conv
    )
    SELECT CAST(d AS INT) AS day_offset,
           CAST(n_conv AS BIGINT) AS n_converted,
           CAST(at_risk AS BIGINT) AS n_at_risk,
           CAST(floor(n_conv * 10000.0 / at_risk + 0.5) AS BIGINT)
             AS hazard_bp
    FROM haz
    """,
)
def conversion_hazard_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time conversion hazard: among users with a 'click', the
    per-day-offset rate of FIRST 'purchase' strictly after the first
    click — n_converted(d) / n_at_risk(d) with the at-risk set shrinking
    by prior conversions (Kaplan-Meier numerator/denominator, no
    censoring term). All counts exact integers; rates integer basis
    points. Plan: first-click agg and the purchase join share the
    user_id Exchange; the offset census is a tiny hash agg; the at-risk
    cumulative window runs over <= max-offset rows."""
    ev = load(spark, sf_dir, "events")
    fc = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .join(fc, "user_id")
        .where(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purch_ts"), F.min("click_ts").alias("click_ts"))
    )
    conv = fp.groupBy(
        F.datediff(F.to_date("purch_ts"), F.to_date("click_ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n_conv"))
    tot = fc.agg(F.count(F.lit(1)).alias("n_cohort"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    haz = (
        conv.crossJoin(F.broadcast(tot))
        .withColumn(
            "at_risk",
            F.col("n_cohort") - F.coalesce(F.sum("n_conv").over(w), F.lit(0)),
        )
    )
    return haz.select(
        F.col("d").cast("int").alias("day_offset"),
        F.col("n_conv").cast("long").alias("n_converted"),
        F.col("at_risk").cast("long").alias("n_at_risk"),
        F.floor(F.col("n_conv") * F.lit(10000.0) / F.col("at_risk") + F.lit(0.5))
        .cast("long")
        .alias("hazard_bp"),
    )


@_q(
    "gini_user_concentration",
    """
    WITH c AS (
      SELECT event_type, user_id, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ), r AS (
      SELECT event_type, cnt,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cnt ASC, user_id ASC) AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             SUM(cnt) OVER (PARTITION BY event_type) AS tot
      FROM c
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_users,
           CAST(max(tot) AS BIGINT) AS n_events,
           CAST((SUM((2*i - n - 1) * cnt) * 2000000 + max(n) * max(tot))
                // (2 * max(n) * max(tot)) AS BIGINT) AS gini_ppm
    FROM r GROUP BY 1
    """,
)
def gini_user_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event counts per event_type (0 =
    every user contributes equally, ->1 = a few users dominate) — the
    host-concentration gate a corpus builder runs before trusting a
    source mix. Exact integer numerator Σ(2i-n-1)·c_i over ascending
    counts; the one division is parts-per-million via integer DIV.

    SCALE-SAFE FORM: Gini depends only on the multiset of counts, so
    the plan aggregates to a count-HISTOGRAM (event_type, cnt, m) and
    applies the tie-block closed form c·m·(2I + m - n) per distinct
    count value (I = users before the block) — the ranking window runs
    over |distinct count values| rows, not |users|. The oracle is the
    independent naive per-user row_number formulation; the hash match
    proves the closed form. Ties are order-free in both (equal counts
    within a block contribute identically)."""
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("cnt"))
    hist = c.groupBy("event_type", "cnt").agg(F.count(F.lit(1)).alias("m"))
    w_all = Window.partitionBy("event_type")
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("cnt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    blocks = (
        hist.withColumn("n", F.sum("m").over(w_all))
        .withColumn("tot", F.sum(F.col("cnt") * F.col("m")).over(w_all))
        .withColumn("before", F.coalesce(F.sum("m").over(w_cum), F.lit(0)))
        .withColumn(
            "contrib",
            F.col("cnt")
            * F.col("m")
            * (F.lit(2) * F.col("before") + F.col("m") - F.col("n")),
        )
    )
    return (
        blocks.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_users"),
            F.max("tot").cast("long").alias("n_events"),
            F.sum("contrib").alias("numer"),
        )
        .select(
            "event_type",
            "n_users",
            "n_events",
            F.expr(
                "CAST((numer * 2000000 + n_users * n_events)"
                " DIV (2 * n_users * n_events) AS BIGINT)"
            ).alias("gini_ppm"),
        )
    )
