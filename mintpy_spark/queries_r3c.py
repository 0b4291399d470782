"""Round-3 additions, batch c: robust velocity (Theil-Sen), content drift
(inter-snapshot shingle Jaccard), LTOB shape-preserving downsampling, and
scalar-quantized similarity search.

Same oracle discipline as mintpy_spark.queries: identical aliases both
sides, in-query rounding both sides, integer arithmetic wherever a ranking
or a comparison crosses the engine boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _DY_SQL, _q, load


@_q(
    "velocity_theilsen",
    f"""
    WITH base AS (
      SELECT user_id,
             {_DY_SQL.format(t='ts')} - 2024.0 AS t,
             value AS v,
             row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      FROM events
    )
    SELECT a.user_id AS user_id,
           ROUND(median((b.v - a.v) / (b.t - a.t)), 4) AS velocity,
           COUNT(*) AS num_pairs
    FROM base a JOIN base b
      ON a.user_id = b.user_id
     AND b.rn > a.rn AND b.rn <= a.rn + 20
     AND b.t > a.t
    GROUP BY a.user_id
    """,
)
def velocity_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust page-change velocity: banded Theil-Sen (median of pairwise
    slopes, rank band k=20) — the outlier-resistant twin of
    `velocity_linear` (timeseries2velocity.py OLS) whose banding mirrors
    the reference's sequential-connection ifgram network
    (stack.py:1292-1352).  DuckDB's median == quantile_cont(0.5), the same
    interpolation Spark's exact percentile uses."""
    from mintpy_spark.operators.robust import theil_sen_velocity

    ev = load(spark, sf_dir, "events")
    out = theil_sen_velocity(
        ev, "value", key="user_id", ts="ts", max_lag=20, ref_year=2024.0
    )
    return out.select(
        "user_id", F.round("velocity", 4).alias("velocity"), "num_pairs"
    )


@_q(
    "drift_shingle_jaccard",
    """
    WITH sh AS (
      SELECT source, doc_id,
             list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                            FOR i IN range(1, len(ws) - 1)]) AS s
      FROM (SELECT source, doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS ws
            FROM documents)
    ),
    pairs AS (
      SELECT source, doc_id, s,
             lag(s) OVER (PARTITION BY source ORDER BY doc_id) AS p
      FROM sh
    )
    SELECT source, doc_id,
           len(list_intersect(s, p)) AS inter,
           len(list_distinct(s || p)) AS union_sz,
           CASE WHEN len(list_distinct(s || p)) > 0
                THEN ROUND(len(list_intersect(s, p))::DOUBLE
                           / len(list_distinct(s || p)), 4)
                END AS jaccard
    FROM pairs WHERE p IS NOT NULL
    """,
)
def drift_shingle_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-level change between consecutive documents of a stream:
    3-shingle Jaccard against the predecessor (the ifgramStack
    sequential-pair pattern, stack.py:688, pointed at content instead of
    metrics).  Arrays stay row-local — no token explosion, one shuffle."""
    from mintpy_spark.operators.drift import shingle_drift

    docs = load(spark, sf_dir, "documents")
    return shingle_drift(docs, text_col="text", key="source", order_col="doc_id", n=3)


@_q(
    "downsample_ltob_1d",
    """
    WITH staged AS (
      SELECT user_id, ts,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
             epoch_us(ts) AS t,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
      FROM events
    ),
    nbr AS (
      SELECT *,
             lag(t)  OVER w AS tp, lag(v)  OVER w AS vp,
             lead(t) OVER w AS tn, lead(v) OVER w AS vn
      FROM staged WINDOW w AS (PARTITION BY user_id ORDER BY t)
    ),
    ar AS (
      SELECT user_id, bucket_start, ts, v,
             abs((tp - tn) * (v - vp) - (tp - t) * (vn - vp)) AS area2,
             row_number() OVER (
               PARTITION BY user_id, bucket_start
               ORDER BY abs((tp - tn) * (v - vp) - (tp - t) * (vn - vp))
                        DESC NULLS LAST, t) AS rn
      FROM nbr
    )
    SELECT user_id, bucket_start, ts, v::DOUBLE / 100 AS value, area2
    FROM ar WHERE rn = 1
    """,
)
def downsample_ltob_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-One-Bucket daily downsample of each user's series
    (Steinarsson 2013) — all-integer triangle areas (epoch-us x
    fixed-point values) so the argmax is exact in both engines."""
    from mintpy_spark.operators.downsample import ltob_downsample

    ev = load(spark, sf_dir, "events")
    return ltob_downsample(ev, "value", tier="1d", key="user_id", ts="ts")


@_q(
    "simsearch_sq_topk",
    """
    WITH q AS (
      SELECT list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 128.0 + 0.5) AS BIGINT)) AS qv
      FROM embeddings WHERE vec_id = 0
    )
    SELECT e.vec_id, e.label,
           CAST(list_sum(list_transform(
             list_zip(list_transform(e.embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 128.0 + 0.5) AS BIGINT)),
                      q.qv),
             p -> p[1] * p[2])) AS BIGINT) AS qdot
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY qdot DESC, e.vec_id ASC LIMIT 10
    """,
)
def simsearch_sq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by scalar-quantized integer dot product: fixed-point int8-style
    embedding compression (floor(x*128 + 0.5)) with an EXACT integer
    ranking — the embedding-side sibling of the Gorilla fixed-point codec.
    Zero exchanges: the quantized query vector is a 1-row broadcast."""
    from mintpy_spark.operators.similarity import sq_quantize

    e = load(spark, sf_dir, "embeddings")
    qv = F.broadcast(
        e.where(F.col("vec_id") == 0).select(
            sq_quantize(F.col("embedding"), 128.0).alias("qv")
        )
    )
    qdot = F.aggregate(
        F.zip_with(
            sq_quantize(F.col("embedding"), 128.0), F.col("qv"), lambda a, b: a * b
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        e.where(F.col("vec_id") != 0)
        .crossJoin(qv)
        .select("vec_id", "label", qdot.alias("qdot"))
        .orderBy(F.desc("qdot"), F.asc("vec_id"))
        .limit(10)
    )


def _ewma_oracle(alpha: float = 0.3, max_lag: int = 8) -> str:
    """Inline the IDENTICAL weight literals the Spark plan uses; ::DOUBLE
    because DuckDB types bare float literals as DECIMAL."""
    ws = [(1.0 - alpha) ** j for j in range(max_lag + 1)]
    num = " + ".join(
        f"CASE WHEN lag(value, {j}) OVER w IS NOT NULL"
        f" THEN lag(value, {j}) OVER w * {ws[j]!r}::DOUBLE ELSE 0.0 END"
        for j in range(max_lag + 1)
    )
    den = " + ".join(
        f"CASE WHEN lag(value, {j}) OVER w IS NOT NULL"
        f" THEN {ws[j]!r}::DOUBLE ELSE 0.0 END"
        for j in range(max_lag + 1)
    )
    return f"""
    SELECT user_id, ts, value, ROUND(({num}) / ({den}), 4) AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    """


@_q("temporal_filter_ewma", _ewma_oracle())
def temporal_filter_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated EWMA smoother (exponential member of the stack.py:481-541
    temporal-filter family): 8-lag window, weights normalized over the
    lags that exist. One shuffle, no Python, literal weights both sides."""
    from mintpy_spark.operators.filters import ewma_filter

    ev = load(spark, sf_dir, "events")
    out = ewma_filter(ev, "value", alpha=0.3, max_lag=8, key="user_id", ts="ts")
    return out.select("user_id", "ts", "value", F.round("ewma", 4).alias("ewma"))
