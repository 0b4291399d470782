"""Round-3 batch kk: median-of-means robust mean + bitmap retention.

- ``robust_mom_daily``: the median-of-means estimator (the standard
  heavy-tail-robust mean with sub-Gaussian concentration, public
  literature) — rows hash into 10 deterministic buckets, each bucket
  mean comes from EXACT integer partials, and the median over the 10
  bucket means is the one cross-engine-safe order statistic
  (percentile == quantile_cont linear interpolation on identical
  doubles).
- ``bitmap_retention_weekly``: week-over-week retained users via
  user-indexed presence masks — |active(w) AND active(w+1)| as word-wise
  popcounts, the O(words) twin of the set-based cohort_retention_weekly
  (rows never shuffle per user for the intersection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

_NB = 10  # median-of-means buckets


@_q(
    "robust_mom_daily",
    f"""
    WITH b AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed,
             ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15)
              )::BIGINT % {_NB} AS bkt,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ), m AS (
      SELECT ed, bkt,
             CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS bmean
      FROM b GROUP BY 1, 2
    )
    SELECT ed,
           ROUND(median(bmean), 6) AS mom_cents,
           CAST(COUNT(*) AS BIGINT) AS n_buckets
    FROM m GROUP BY 1
    """,
)
def robust_mom_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-means daily value: hash-bucketed (event_id md5 — content
    -independent and NULL-free), integer bucket partials, exact median of
    the bucket means. Outliers corrupt at most their own bucket; the
    median ignores it."""
    from mintpy_spark.functions.scalars import portable_hash60

    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    b = ev.select(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("ed"),
        F.pmod(
            portable_hash60(F.col("event_id").cast("string")), F.lit(_NB)
        ).alias("bkt"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    m = b.groupBy("ed", "bkt").agg(
        (F.sum("cents").cast("double") / F.count(F.lit(1))).alias("bmean")
    )
    return m.groupBy("ed").agg(
        F.round(F.expr("percentile(bmean, 0.5)"), 6).alias("mom_cents"),
        F.count(F.lit(1)).alias("n_buckets"),
    )


@_q(
    "bitmap_retention_weekly",
    """
    WITH w AS (
      SELECT DISTINCT
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk,
             user_id
      FROM events WHERE user_id IS NOT NULL
    ), masks AS (
      SELECT wk, user_id // 60 AS word,
             bit_or(1::BIGINT << CAST(user_id % 60 AS INT)) AS mask
      FROM w GROUP BY 1, 2
    ), act AS (
      SELECT wk, CAST(SUM(bit_count(mask)) AS BIGINT) AS active
      FROM masks GROUP BY 1
    ), ret AS (
      SELECT a.wk,
             CAST(SUM(bit_count(a.mask & b.mask)) AS BIGINT) AS retained
      FROM masks a JOIN masks b
        ON b.wk = a.wk + 1 AND b.word = a.word
      GROUP BY 1
    )
    SELECT act.wk, act.active, COALESCE(ret.retained, 0) AS retained
    FROM act LEFT JOIN ret ON ret.wk = act.wk
    WHERE EXISTS (SELECT 1 FROM act a2 WHERE a2.wk = act.wk + 1)
    """,
)
def bitmap_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users active in week w AND w+1, from user-indexed 60-bit presence
    words: the intersection is a word-aligned AND + popcount over
    |users|/60 rows per week — row volume never touches the join. Weeks
    without a successor are excluded (no retention to measure)."""
    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    w = ev.select(
        F.expr(
            "datediff(to_date(ts), DATE '1970-01-01') div 7"
        ).alias("wk"),
        "user_id",
    ).distinct()
    masks = w.groupBy(
        "wk", F.expr("user_id div 60").alias("word")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 60 AS INT))")
        ).alias("mask")
    )
    act = masks.groupBy("wk").agg(
        F.sum(F.bit_count("mask")).cast("long").alias("active")
    )
    a, b = masks.alias("a"), masks.alias("b")
    ret = (
        a.join(
            b,
            (F.col("b.wk") == F.col("a.wk") + 1)
            & (F.col("b.word") == F.col("a.word")),
        )
        .groupBy(F.col("a.wk").alias("wk"))
        .agg(
            F.sum(
                F.bit_count(F.col("a.mask").bitwiseAND(F.col("b.mask")))
            ).cast("long").alias("retained")
        )
    )
    nxt = act.select((F.col("wk") - 1).alias("wk")).distinct()
    return (
        act.join(nxt, "wk", "left_semi")
        .join(ret, "wk", "left")
        .select(
            "wk", "active", F.coalesce("retained", F.lit(0)).alias("retained")
        )
    )
