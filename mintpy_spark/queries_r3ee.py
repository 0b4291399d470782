"""Round-3 additions, batch ee: sliding-window sketch quantiles and the
power-iteration eigenvector.

* sliding HDR p50/p99 — trailing-7-day latency-style percentiles per
  day, composed ENTIRELY from per-day sketch partials: each day sketch
  fans into the 7 window-ends it covers (the daily_actives cover trick
  applied to sketch rows), counters sum per (window, bucket), one rank
  rule.  Cost per window is sketch width x 7, INDEPENDENT of row
  volume — the sliding-quantile problem that has no exact mergeable
  solution gets the sketch answer at fixed cost.  The oracle builds
  every window DIRECTLY from raw rows, so the hash match proves the
  cover-merge is loss-free.
* top eigenvector — distributed power iteration over the embedding
  second-moment matrix (operators/similarity.top_eigen): rows-only
  registry citizen (float sum order is partitioning-dependent at the
  last ulp); accuracy pinned by the numpy seed-and-recover pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.operators.sketch import hdr_merge, hdr_quantiles, hdr_tier
from mintpy_spark.queries import _q, load
# the ONE HDR-bucket oracle recipe — imported, never copied (a bucket-rule
# fix applied there must reach every HDR oracle; review finding)
from mintpy_spark.queries_r3t import _HDR_BUCKET_SQL


@_q(
    "rollup_7d_sliding_p99_hdr",
    f"""
    WITH obs AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ), cover AS (
      SELECT day + t.i * INTERVAL 1 DAY AS wd, cents
      FROM obs, unnest([0, 1, 2, 3, 4, 5, 6]) AS t(i)
    ), sk AS (
      SELECT wd, {_HDR_BUCKET_SQL} AS bucket, COUNT(*) AS cnt
      FROM cover WHERE wd IN (SELECT DISTINCT day FROM obs)
      GROUP BY 1, 2
    ), c AS (
      SELECT wd, bucket,
             SUM(cnt) OVER (PARTITION BY wd ORDER BY bucket) AS cum,
             SUM(cnt) OVER (PARTITION BY wd) AS tot
      FROM sk
    ), hit AS (
      SELECT wd, q, MIN(bucket) AS qa
      FROM c CROSS JOIN (SELECT unnest([0.50, 0.99]) AS q)
      WHERE cum >= ceil(q * tot)
      GROUP BY 1, 2
    )
    SELECT wd AS bucket_start,
           CAST(MAX(tot2.n) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN q = 0.50 THEN qa END) AS BIGINT) AS p50,
           CAST(MAX(CASE WHEN q = 0.99 THEN qa END) AS BIGINT) AS p99
    FROM hit
    JOIN (SELECT wd, SUM(cnt) AS n FROM sk GROUP BY 1) tot2 USING (wd)
    GROUP BY 1
    """,
)
def rollup_7d_sliding_p99_hdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day p50/p99 of integer-cents values per active day,
    composed from PER-DAY HDR sketch partials: day sketches fan into
    the <=7 window-ends they cover, counters sum per (window, bucket),
    then the one rank rule (hdr_quantiles).  The Spark side never
    re-reads raw rows per window — cost is sketch-width x 7 per day —
    while the oracle builds each window directly from raw; the hash
    match proves the cover-merge loses nothing.  Plan: one pruned scan
    -> (day, bucket) sketch agg -> bounded x7 fan-out -> (window,
    bucket) merge agg -> cumulative window over <=512 buckets."""
    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    obs = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    day_sk = hdr_tier(obs, "cents", key_cols=("day",))
    cover = day_sk.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(6))
        ).alias("_i"),
        "day",
        "bucket",
        "cnt",
    ).select(
        F.expr("day + make_interval(0, 0, 0, _i)").alias("wd"),
        "bucket",
        "cnt",
    )
    days = obs.select(F.col("day").alias("wd")).distinct()
    merged = hdr_merge(
        cover.join(days, "wd"), key_cols=("wd",)
    )
    qs = hdr_quantiles(merged, {"p50": 0.50, "p99": 0.99}, key_cols=("wd",))
    tot = merged.groupBy("wd").agg(F.sum("cnt").cast("long").alias("n"))
    return (
        qs.join(tot, "wd")
        .select(
            F.col("wd").alias("bucket_start"),
            "n",
            F.col("p50").cast("long").alias("p50"),
            F.col("p99").cast("long").alias("p99"),
        )
    )


@_q("embedding_top_eigen")  # rows-only: float sum order is partitioning-dependent
def embedding_top_eigen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant eigenvector of the embedding second-moment matrix via
    distributed power iteration (operators/similarity.top_eigen) — the
    whitening/anisotropy primitive.  Output: one row per dimension
    (i, component) plus the eigenvalue estimate repeated; rows-only
    (no SQL oracle can express the iteration; last-ulp float sums vary
    with partitioning), accuracy pinned by the numpy recovery pytest."""
    from mintpy_spark.operators.similarity import top_eigen

    emb = load(spark, sf_dir, "embeddings")
    [(v, lam)] = top_eigen(emb, "embedding", dim=64, iters=8)
    rows = [(i, float(c), float(lam)) for i, c in enumerate(v)]
    return spark.createDataFrame(rows, "i long, component double, eigenvalue double")
