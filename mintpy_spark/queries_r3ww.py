"""Round-3 batch ww: embedding-column geometry audits.

All three follow the repo's embedding exactness idiom
(embedding_label_silhouette): floats quantize to x128 fixed-point
BIGINTs first, then every norm / variance / centroid distance is exact
integer geometry with ONE final double op — no float summation order
anywhere.

* ``embedding_norm_census`` — per-label L2-norm-squared distribution
  (the normalize-before-indexing audit: un-normalized islands break
  cosine ANN recall).
* ``embedding_dim_variance_topk`` — top-5 highest-variance dimensions
  (feature-selection / dead-dimension audit; a zero-variance dim is
  wasted index width). Ranking uses the exact integer variance
  numerator n*sum(q^2) - S^2 — n is corpus-constant across dims, so
  the integer rank IS the variance rank.
* ``embedding_centroid_shift`` — per-label centroid distance from the
  global centroid: || S_l/n_l - T/n || via the cross-multiplied exact
  numerator sum_pos (S_pos*n - T_pos*n_l)^2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

_QV_SQL = (
    "list_transform(embedding,"
    " x -> CAST(floor(CAST(x AS DOUBLE) * 128.0 + 0.5) AS BIGINT))"
)


def _qvec(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    qv = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 128.0 + 0.5).cast("long"),
    )
    return e.select("vec_id", "label", qv.alias("qv"))


@_q(
    "embedding_norm_census",
    f"""
    WITH q AS (
      SELECT vec_id, label, {_QV_SQL} AS qv FROM embeddings
    ), n AS (
      SELECT label,
             CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS sq
      FROM q
    )
    SELECT label, COUNT(*) AS n_vecs,
           CAST(MIN(sq) AS BIGINT) AS min_sq,
           CAST(MAX(sq) AS BIGINT) AS max_sq,
           CAST(SUM(sq) AS BIGINT) AS sum_sq,
           CAST((2 * SUM(sq) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
             AS mean_sq
    FROM n GROUP BY 1
    """,
)
def embedding_norm_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label quantized L2-norm-squared census: min/max/sum/rounded
    mean. The norm fold is ROW-LOCAL (one aggregate over the staged
    array — the vector never explodes into rows), so the only shuffle
    is the 10-group label agg."""
    q = _qvec(spark, sf_dir)
    sq = F.aggregate(
        F.transform("qv", lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n = q.select("label", sq.alias("sq"))
    return n.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min("sq").cast("long").alias("min_sq"),
        F.max("sq").cast("long").alias("max_sq"),
        F.sum("sq").cast("long").alias("sum_sq"),
        F.expr("(2 * SUM(sq) + COUNT(*)) DIV (2 * COUNT(*))")
        .cast("long")
        .alias("mean_sq"),
    )


@_q(
    "embedding_dim_variance_topk",
    f"""
    WITH q AS (
      SELECT {_QV_SQL} AS qv FROM embeddings
    ), d AS (
      SELECT CAST(generate_subscripts(qv, 1) AS BIGINT) AS pos,
             unnest(qv) AS v
      FROM q
    ), s AS (
      SELECT pos, COUNT(*) AS n,
             CAST(SUM(v) AS BIGINT) AS sv,
             CAST(SUM(v * v) AS BIGINT) AS qq
      FROM d GROUP BY 1
    ), r AS (
      SELECT pos, n, sv, qq,
             CAST(n * qq - sv * sv AS BIGINT) AS var_num,
             row_number() OVER (ORDER BY n * qq - sv * sv DESC, pos)
               AS rnk
      FROM s
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, pos, var_num,
           CAST(n AS BIGINT) AS n_vecs,
           ROUND(CAST(var_num AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 4) AS variance
    FROM r WHERE rnk <= 5
    """,
)
def embedding_dim_variance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 embedding dimensions by population variance: posexplode to
    (pos, value), one 64-group aggregate of exact integer (n, sum,
    sum-of-squares), then ranking on the EXACT variance numerator
    n*qq - sv^2 (n identical across dims, so integer order = variance
    order; pos tiebreak). The window runs over 64 rows."""
    q = _qvec(spark, sf_dir)
    d = q.select(F.posexplode("qv").alias("pos0", "v")).select(
        (F.col("pos0") + 1).cast("long").alias("pos"), "v"
    )
    s = d.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("long").alias("sv"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("qq"),
    )
    var_num = (F.col("n") * F.col("qq") - F.col("sv") * F.col("sv")).cast("long")
    w = Window.orderBy(F.desc("var_num"), F.asc("pos"))
    r = s.withColumn("var_num", var_num).withColumn(
        "rnk", F.row_number().over(w)
    )
    return r.where(F.col("rnk") <= 5).select(
        F.col("rnk").cast("long").alias("rnk"),
        "pos", "var_num",
        F.col("n").cast("long").alias("n_vecs"),
        F.round(
            F.col("var_num").cast("double")
            / (F.col("n").cast("double") * F.col("n").cast("double")),
            4,
        ).alias("variance"),
    )


@_q(
    "embedding_centroid_shift",
    f"""
    WITH q AS (
      SELECT label, {_QV_SQL} AS qv FROM embeddings
    ), d AS (
      SELECT label, CAST(generate_subscripts(qv, 1) AS BIGINT) AS pos,
             unnest(qv) AS v
      FROM q
    ), per_label AS (
      SELECT label, pos, CAST(SUM(v) AS BIGINT) AS s,
             COUNT(*) AS nl
      FROM d GROUP BY 1, 2
    ), global_c AS (
      SELECT pos, CAST(SUM(s) AS BIGINT) AS t, CAST(SUM(nl) AS BIGINT) AS n
      FROM per_label GROUP BY 1
    )
    SELECT p.label, CAST(MAX(p.nl) AS BIGINT) AS n_vecs,
           CAST(SUM((p.s * g.n - g.t * p.nl) * (p.s * g.n - g.t * p.nl))
                AS BIGINT) AS shift_num,
           ROUND(sqrt(CAST(SUM((p.s * g.n - g.t * p.nl)
                               * (p.s * g.n - g.t * p.nl)) AS DOUBLE))
                 / (CAST(MAX(p.nl) AS DOUBLE) * CAST(MAX(g.n) AS DOUBLE)),
                 4) AS shift
    FROM per_label p JOIN global_c g ON p.pos = g.pos
    GROUP BY 1
    """,
)
def embedding_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance of each label's centroid from the global centroid in
    quantized units: the cross-multiplied numerator (S_pos*n - T_pos*n_l)^2
    sums as exact BIGINTs; one sqrt + one division at the end. The
    per-(label, pos) sums are one aggregate over the posexplode; the
    global centroid is its 64-row re-aggregation (broadcast back). A
    label drifting from the corpus centroid is the class-imbalance /
    domain-shift signature an ANN index partitioner cares about."""
    q = _qvec(spark, sf_dir)
    d = q.select(
        "label", F.posexplode("qv").alias("pos0", "v")
    ).select("label", (F.col("pos0") + 1).cast("long").alias("pos"), "v")
    per_label = d.groupBy("label", "pos").agg(
        F.sum("v").cast("long").alias("s"), F.count(F.lit(1)).alias("nl")
    )
    global_c = per_label.groupBy("pos").agg(
        F.sum("s").cast("long").alias("t"), F.sum("nl").cast("long").alias("n")
    )
    j = per_label.join(F.broadcast(global_c), "pos")
    diff = F.col("s") * F.col("n") - F.col("t") * F.col("nl")
    return j.groupBy("label").agg(
        F.max("nl").cast("long").alias("n_vecs"),
        F.sum(diff * diff).cast("long").alias("shift_num"),
        F.round(
            F.sqrt(F.sum(diff * diff).cast("double"))
            / (F.max("nl").cast("double") * F.max("n").cast("double")),
            4,
        ).alias("shift"),
    )
