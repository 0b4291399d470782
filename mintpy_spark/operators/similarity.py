"""Similarity search over embedding columns: exact cosine top-k (baseline)
and hyperplane-LSH bucketed ANN (the scale path).

The LSH family is random +/-1 projections (sign of <v, r_j> for planes
r_j in {-1,+1}^d — Charikar's SimHash for vectors). The plane matrix is a
deterministic function of (seed, plane, dim) via md5 parity, computed
driver-side and inlined as literals, so the DuckDB oracle uses the *same*
planes and the bucket assignment is engine-exact. Projections are computed
over floor(1000 * x) integers so the sign never depends on float summation
order.

Scale notes (100 TB): the bucketed variant turns brute-force O(N) per query
into a partition-pruned scan of one bucket (expected N / 2^planes); buckets
are a group-by key, so the index build is one shuffle and queries are a
broadcast-joined probe. The exact variant stays as the verification oracle
(same role as the reference's serial solve vs Dask path,
ifgram_inversion.py:803-853 two-path strategy).
"""

from __future__ import annotations

import hashlib

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NUM_PLANES = 8
SCALE = 1000  # fixed-point factor: floor(SCALE * x) before projecting


def plane_signs(dim: int, num_planes: int = NUM_PLANES, seed: int = 12138) -> list[list[int]]:
    """Deterministic {-1,+1}^dim planes from md5 parity of (seed, j, i)."""
    planes = []
    for j in range(num_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()
            row.append(1 if int(h[:15], 16) % 2 == 0 else -1)
        planes.append(row)
    return planes


def _fixed(vec_col: Column) -> Column:
    """float array -> exact BIGINT fixed-point array (floor(1000x))."""
    return F.transform(vec_col, lambda x: F.floor(x.cast("double") * SCALE).cast("long"))


def _idot(x: Column, signs: list[int]) -> Column:
    """Exact integer projection <x, signs> (sum of 64 bounded longs)."""
    s = F.array([F.lit(v) for v in signs])
    return F.aggregate(
        F.zip_with(x, s, lambda a, b: a * b), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def hyperplane_bucket(
    vec_col: Column, dim: int, num_planes: int = NUM_PLANES, seed: int = 12138
) -> Column:
    """LSH bucket id in [0, 2^num_planes): bit j set iff <v, r_j> > 0."""
    fx = _fixed(vec_col)
    planes = plane_signs(dim, num_planes, seed)
    bucket = None
    for j, row in enumerate(planes):
        bit = F.when(_idot(fx, row) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def with_bucket(
    emb: DataFrame, vec_col: str = "embedding", dim: int = 64,
    num_planes: int = NUM_PLANES, seed: int = 12138,
) -> DataFrame:
    return emb.withColumn(
        "bucket", hyperplane_bucket(F.col(vec_col), dim, num_planes, seed)
    )


def cosine(x: Column, y: Column) -> Column:
    """Double cosine, sequential-fold evaluation order (oracle-matching)."""

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda u, v: u * v), F.lit(0.0), lambda acc, v: acc + v
        )

    return dot(x, y) / (F.sqrt(dot(x, x)) * F.sqrt(dot(y, y)))


def ann_topk_lsh(
    emb: DataFrame, query_id: int, k: int = 10, vec_col: str = "embedding",
    id_col: str = "vec_id", dim: int = 64, num_planes: int = NUM_PLANES,
    seed: int = 12138,
) -> DataFrame:
    """Top-k cosine among vectors sharing the query's LSH bucket.

    The bucket filter is the ANN speedup: candidates ~ N / 2^planes. The
    query row (single row) is broadcast; ordering is on the 4-dp-rounded
    similarity with id tie-break so results are engine-deterministic.
    """
    b = with_bucket(emb, vec_col, dim, num_planes, seed)
    dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    q = F.broadcast(
        b.where(F.col(id_col) == query_id).select(
            dv.alias("qv"), F.col("bucket").alias("qbucket")
        )
    )
    emb_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (
        b.crossJoin(q)
        .where((F.col("bucket") == F.col("qbucket")) & (F.col(id_col) != query_id))
        .select(
            id_col,
            "bucket",
            F.round(cosine(emb_d, F.col("qv")), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle builders (same planes, same fixed-point projection)
# ---------------------------------------------------------------------------

def _sql_list(values: list[int]) -> str:
    return "[" + ", ".join(str(v) for v in values) + "]"


def bucket_oracle_expr(
    vec_expr: str, dim: int, num_planes: int = NUM_PLANES, seed: int = 12138
) -> str:
    """SQL expression computing the same bucket id over ``vec_expr``
    (a FLOAT[] column): fixed-point + literal plane lists."""
    fx = f"list_transform({vec_expr}, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT))"
    bits = []
    for j, row in enumerate(plane_signs(dim, num_planes, seed)):
        bits.append(
            f"CASE WHEN list_dot_product({fx}, {_sql_list(row)}) > 0 "
            f"THEN {1 << j} ELSE 0 END"
        )
    return "CAST(" + " + ".join(bits) + " AS INT)"


def ann_topk_oracle_sql(
    table: str = "embeddings", query_id: int = 0, k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id", dim: int = 64,
    num_planes: int = NUM_PLANES, seed: int = 12138,
) -> str:
    bexpr = bucket_oracle_expr(vec_col, dim, num_planes, seed)
    return f"""
    WITH b AS (
      SELECT {id_col}, {vec_col}::DOUBLE[] AS v, {bexpr} AS bucket FROM {table}
    ),
    q AS (SELECT v AS qv, bucket AS qbucket FROM b WHERE {id_col} = {query_id})
    SELECT b.{id_col}, b.bucket,
           ROUND(list_dot_product(b.v, q.qv)
                 / (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(q.qv, q.qv))),
                 4) AS cos_sim
    FROM b, q
    WHERE b.bucket = q.qbucket AND b.{id_col} <> {query_id}
    ORDER BY cos_sim DESC, b.{id_col} ASC
    LIMIT {k}
    """


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantization to fixed centroids, probe the
# nearest n_probe centroid buckets, exact cosine within. The second classic
# ANN family next to hyperplane LSH: LSH buckets are data-independent
# (stable under drift, no training), IVF buckets follow the data
# distribution (tighter candidate sets when the corpus clusters). Here the
# centroid set is a deterministic sample (lowest ``num_centroids`` ids) —
# the training-free "Flat IVF" baseline; a k-means refinement would slot in
# by replacing the centroid table only.
# ---------------------------------------------------------------------------

def _dot_literal(vec_col: Column, cvec: list[float]) -> Column:
    """Sequential-fold dot(row vector, literal vector) — oracle order."""
    lit = F.array(*[F.lit(float(x)) for x in cvec])
    return F.aggregate(
        F.zip_with(vec_col, lit, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )


def _vnorm(vec_col: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(vec_col, vec_col, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _cos_to_literal(vec_col: Column, cvec: list[float]) -> Column:
    """Cosine(row vector, literal centroid); prefer passing a pre-staged
    norm via _dot_literal/_vnorm in multi-centroid loops."""
    import math

    nrm = math.sqrt(sum(float(x) * float(x) for x in cvec))
    return _dot_literal(vec_col, cvec) / (_vnorm(vec_col) * F.lit(nrm))


def ivf_assign(
    emb: DataFrame, centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding", keep_scores: bool = False,
) -> DataFrame:
    """Attach ``ivf_bucket``: argmax-cosine centroid id, lowest id on ties.

    Scores are STAGED as one array column and the argmax is
    array_position(scores, array_max(scores)) — first occurrence, i.e.
    lowest centroid id. (A when-chain over running best would duplicate
    every prior score expression per step — exponential expression-tree
    growth; the array form evaluates each cosine exactly once per row.)
    Requires centroids sorted by id with ids 0..C-1 (load_centroids)."""
    import math

    assert [cid for cid, _ in centroids] == list(range(len(centroids)))
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # stage the row norm ONCE (each cosine would otherwise re-fold it)
    staged = emb.withColumn("_v", v).withColumn("_vn", _vnorm(F.col("_v")))
    scores = F.array(
        *[
            _dot_literal(F.col("_v"), cvec)
            / (F.col("_vn") * F.lit(math.sqrt(sum(x * x for x in cvec))))
            for _cid, cvec in centroids
        ]
    )
    staged = staged.withColumn("_cs", scores)
    bucket = (F.array_position(F.col("_cs"), F.array_max("_cs")) - 1).cast("int")
    out = staged.withColumn("ivf_bucket", bucket)
    if keep_scores:
        return out.drop("_v", "_vn")
    return out.drop("_cs", "_v", "_vn")


def ivf_assign_bcast(
    emb: DataFrame, centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """ivf_assign via a BROADCAST centroid table — the unbounded-codebook
    form (VERDICT r2 #7): the literal form inlines one dot-product
    expression per centroid, so plan size grows with C and the expression
    tree becomes the limit past C ~ 64. Here the codebook is data, not
    plan: one broadcast nested-loop join fans each row out to C
    (row, centroid) pairs, the cosine is a zip_with fold over the two
    array COLUMNS (bit-identical to _dot_literal's index-order fold, so
    assignments match the literal form exactly), and max_by over
    struct(score, -cid) reduces back to one row per id map-side (partial
    aggregation — the shuffle carries N rows, not N*C). The assignment
    then rejoins the input on ``id_col``.

    Semantics identical to ivf_assign: argmax cosine, lowest cid on
    ties."""
    import math

    spark = emb.sparkSession
    cent_rows = [
        (int(cid), [float(x) for x in cvec],
         math.sqrt(sum(float(x) * float(x) for x in cvec)))
        for cid, cvec in centroids
    ]
    cents = spark.createDataFrame(
        cent_rows, "cid int, cv array<double>, cnorm double"
    )
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = emb.select(
        id_col, v.alias("_v"),
    ).withColumn("_vn", _vnorm(F.col("_v")))
    dot = F.aggregate(
        F.zip_with(F.col("_v"), F.col("cv"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    assign = (
        staged.crossJoin(F.broadcast(cents))
        .withColumn("_s", dot / (F.col("_vn") * F.col("cnorm")))
        .groupBy(id_col)
        .agg(F.expr("max_by(cid, struct(_s, -cid))").alias("ivf_bucket"))
    )
    return emb.join(assign, id_col)


def load_centroids(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    num_centroids: int = 16,
) -> list[tuple[int, list[float]]]:
    """Deterministic centroid sample: the ``num_centroids`` lowest ids
    (collected driver-side once — centroid tables are tiny by design)."""
    rows = (
        emb.where(F.col(id_col) < num_centroids)
        .select(id_col, F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"))
        .orderBy(id_col)
        .collect()
    )
    return [(int(r[0]), list(r[1])) for r in rows]


def ivf_topk(
    emb: DataFrame, query_id: int, k: int = 10, n_probe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    num_centroids: int = 16, assign: str = "literal",
) -> DataFrame:
    """IVF ANN top-k: probe the query's ``n_probe`` nearest centroid
    buckets, exact cosine inside — candidates ~ corpus * n_probe / C.

    ``assign``: 'literal' inlines the codebook in the plan (fastest for
    C <= ~16); 'broadcast' joins a broadcast centroid table
    (ivf_assign_bcast) so C is unbounded by expression-tree size — the
    two produce bit-identical assignments."""
    cents = load_centroids(emb, id_col, vec_col, num_centroids)
    if assign == "broadcast":
        assigned = ivf_assign_bcast(emb, cents, vec_col, id_col)
    else:
        assigned = ivf_assign(emb, cents, vec_col)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qrows = emb.where(F.col(id_col) == query_id).select(v.alias("qv")).collect()
    if not qrows:
        raise ValueError(f"query_id {query_id} not found in {id_col}")
    qv = list(qrows[0]["qv"])
    import math

    qscores = sorted(
        (
            (
                -sum(a * b for a, b in zip(qv, cvec))
                / (math.sqrt(sum(a * a for a in qv)) * math.sqrt(sum(b * b for b in cvec))),
                cid,
            )
            for cid, cvec in cents
        )
    )
    probe = [cid for _neg, cid in qscores[:n_probe]]
    # JOIN against the tiny probe set instead of filtering on ivf_bucket:
    # a filter would be predicate-pushed below the assignment projection,
    # re-inlining the full centroid-score array into the Filter (verified:
    # 2-3x re-evaluation of the dominant scoring cost); a broadcast join
    # consumes the bucket ATTRIBUTE, evaluated once
    spark = emb.sparkSession
    probe_df = F.broadcast(
        spark.createDataFrame([(int(c),) for c in probe], "ivf_bucket int")
    )
    cos = _cos_to_literal(v, qv)
    return (
        assigned.join(probe_df, "ivf_bucket")
        .where(F.col(id_col) != query_id)
        .select(id_col, "ivf_bucket", F.round(cos, 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_oracle_sql(
    table: str = "embeddings", query_id: int = 0, k: int = 10, n_probe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding", num_centroids: int = 16,
) -> str:
    """DuckDB re-execution of the IVF path: same centroid sample, same
    argmax assignment (score DESC, cid ASC), same probe set, same cosine."""
    return f"""
    WITH e AS (
      SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {table}
    ),
    c AS (SELECT {id_col} AS cid, v AS cv FROM e WHERE {id_col} < {num_centroids}),
    scored AS (
      SELECT e.{id_col}, c.cid,
             list_dot_product(e.v, c.cv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
               AS s
      FROM e CROSS JOIN c
    ),
    assign AS (
      SELECT {id_col}, cid AS bucket FROM (
        SELECT {id_col}, cid,
               row_number() OVER (PARTITION BY {id_col} ORDER BY s DESC, cid ASC) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    qprobe AS (
      SELECT cid FROM scored WHERE {id_col} = {query_id}
      ORDER BY s DESC, cid ASC LIMIT {n_probe}
    ),
    q AS (SELECT v AS qv FROM e WHERE {id_col} = {query_id})
    SELECT e.{id_col}, CAST(a.bucket AS INT) AS ivf_bucket,
           ROUND(list_dot_product(e.v, q.qv)
                 / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))),
                 4) AS cos_sim
    FROM e JOIN assign a ON e.{id_col} = a.{id_col}, q
    WHERE a.bucket IN (SELECT cid FROM qprobe) AND e.{id_col} <> {query_id}
    ORDER BY cos_sim DESC, e.{id_col} ASC
    LIMIT {k}
    """


def kmeans_refine(
    emb: DataFrame, centroids: list[tuple[int, list[float]]],
    iterations: int = 2, vec_col: str = "embedding", id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """Lloyd refinement of the IVF centroid table: assign -> per-bucket
    mean vector -> repeat. Deterministic: init is the deterministic sample
    (load_centroids), assignment ties break to the lowest centroid id
    (ivf_assign), and the mean is computed per (bucket, dimension) — a
    posexplode + groupBy average whose result does not depend on row
    order beyond float summation (stable to ~1 ulp; the refined centroids
    are driver-side literals thereafter, so downstream assignment is
    exactly reproducible from them).

    Each iteration is two bounded jobs (assign projection + one
    aggregation of C x dim cells); empty buckets keep their previous
    centroid (the standard Lloyd convention)."""
    import numpy as np

    cents = centroids
    dim = len(cents[0][1])
    for _ in range(iterations):
        assigned = ivf_assign(emb, cents, vec_col)
        # SPHERICAL update: average the norm-NORMALIZED vectors — the
        # Lloyd step that matches the cosine assignment/objective (an
        # unnormalized mean lets one large-norm vector tilt the centroid
        # and the cosine inertia can INCREASE). The norm is staged ONCE
        # per row (re-folding _vnorm inside the transform lambda is
        # O(dim^2) per row) and zero norms are nullified so a zero
        # vector contributes NULLs (dropped by avg) instead of NaNs
        # that would poison its bucket's mean.
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        staged = (
            assigned.withColumn("_uv", v)
            .withColumn("_un", F.nullif(_vnorm(F.col("_uv")), F.lit(0.0)))
        )
        unit = F.transform(F.col("_uv"), lambda x: x / F.col("_un"))
        means = (
            staged.withColumn("_unit", unit)
            .select("ivf_bucket", F.posexplode("_unit").alias("pos", "x"))
            .groupBy("ivf_bucket", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_bucket: dict[int, np.ndarray] = {}
        for r in means:
            by_bucket.setdefault(r.ivf_bucket, np.zeros(dim))[r.pos] = r.m
        cents = [
            (cid, list(by_bucket.get(cid, np.array(cvec, dtype=float))))
            for cid, cvec in cents
        ]
    return cents


def kmeans_inertia(
    emb: DataFrame, centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> float:
    """Mean (1 - cosine-to-assigned-centroid) — the spherical-k-means
    objective the refinement minimizes. Reuses the score array ivf_assign
    already staged: the assigned bucket IS argmax(_cs), so the objective
    is avg(1 - array_max(_cs)) — no re-scoring."""
    assigned = ivf_assign(emb, centroids, vec_col, keep_scores=True)
    row = assigned.agg(
        F.avg(F.lit(1.0) - F.array_max("_cs")).alias("inertia")
    ).first()
    return float(row["inertia"])


# ---------------------------------------------------------------------------
# Scalar (int8-style) quantized similarity search
# ---------------------------------------------------------------------------

def sq_quantize(vec: Column, scale: float = 128.0) -> Column:
    """Fixed-point scalar quantization of a float vector: each component
    becomes ``floor(x*scale + 0.5)`` as a 64-bit integer.  floor(+0.5) is
    used instead of ROUND because it is bit-identical across engines
    (Spark ROUND is BigDecimal HALF_UP on the shortest decimal repr,
    DuckDB rounds the scaled double — they disagree on half-way points;
    floor on the same double never does).  This is the embedding-side
    analog of the Gorilla fixed-point discipline the codec layer uses:
    4 bytes/dim float32 -> ~1 byte/dim of entropy, and the quantized dot
    product is EXACT integer arithmetic, so ranking is engine-portable
    and reproducible under any partitioning."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(scale) + F.lit(0.5)).cast("long")
    )


def sq_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    scale: float = 128.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    exclude_id: int | None = None,
) -> DataFrame:
    """Brute-force top-k by quantized integer dot product.

    The query vector is quantized driver-side with the SAME floor(+0.5)
    formula and inlined as an integer literal array, so the scan stays a
    single whole-stage-codegen projection with zero exchanges and zero
    Python (literal-constants-beat-cross-engine-functions discipline).
    Magnitude bound: |q_i| <= scale, 64 dims -> |dot| <= 64*scale^2 ~ 1e6,
    nowhere near ANSI overflow.  Ties break on the id for a deterministic
    TakeOrderedAndProject."""
    qints = [int(np.floor(float(x) * scale + 0.5)) for x in query_vec]
    qlit = F.array(*[F.lit(v) for v in qints])
    qdot = F.aggregate(
        F.zip_with(sq_quantize(F.col(vec_col), scale), qlit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = emb.select(id_col, label_col, qdot.alias("qdot"))
    if exclude_id is not None:
        scored = scored.where(F.col(id_col) != exclude_id)
    return scored.orderBy(F.desc("qdot"), F.asc(id_col)).limit(k)


def sq_topk_oracle_sql(
    query_vec: list[float],
    k: int = 10,
    scale: float = 128.0,
    exclude_id: int | None = None,
) -> str:
    """DuckDB replica of :func:`sq_topk` with the identical literal
    quantized query vector."""
    qints = [int(np.floor(float(x) * scale + 0.5)) for x in query_vec]
    qlist = "[" + ", ".join(str(v) for v in qints) + "]"
    where = f"WHERE vec_id <> {exclude_id}" if exclude_id is not None else ""
    return f"""
    SELECT vec_id, label, qdot FROM (
      SELECT vec_id, label,
             CAST(list_sum(list_transform(
               list_zip(
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * {scale} + 0.5) AS BIGINT)),
                 {qlist}),
               p -> p[1] * p[2])) AS BIGINT) AS qdot
      FROM embeddings {where}
    ) ORDER BY qdot DESC, vec_id LIMIT {k}
    """


def top_eigen(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    iters: int = 8,
) -> "list[tuple[list, float]]":
    """Dominant eigenvector + eigenvalue of the embedding second-moment
    matrix by POWER ITERATION — the PCA-lite primitive behind embedding
    whitening, drift detection, and anisotropy audits.

    Each iteration is ONE distributed pass: stage the scalar projection
    d = x.v row-locally (zip_with fold against the broadcast-literal
    vector), then accumulate w = sum_rows x * d via a bounded
    posexplode (x ``dim`` fan-out) into a ``dim``-row hash agg; the
    driver holds only the dim-float vector between iterations.  At
    10^12 rows: persist the input once, k iterations = k narrow jobs,
    no gram matrix ever materializes (dim^2 would be fine; row x dim
    never leaves the executors).

    Float sums are order-dependent across partitionings (last-ulp), so
    this is a rows-only registry citizen — accuracy is pinned by the
    seed-and-recover pytest against numpy.linalg.eigh instead of a SQL
    oracle.  Returns [(vector, eigenvalue_estimate)].
    """
    import math

    df = df.persist()  # k iterations re-read this; one materialization
    v = [1.0 / math.sqrt(dim)] * dim
    lam = 0.0
    for _ in range(iters):
        vlit = F.array(*[F.lit(float(c)) for c in v])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), vlit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        comps = (
            df.select(d.alias("_d"), F.posexplode(vec_col).alias("i", "x"))
            .groupBy("i")
            .agg(F.sum(F.col("x") * F.col("_d")).alias("w"))
            .collect()
        )
        w = [0.0] * dim
        for r in comps:
            w[r["i"]] = r["w"]
        lam = math.sqrt(sum(c * c for c in w))  # ||Av|| with unit v
        if lam == 0.0:
            break
        v = [c / lam for c in w]
    df.unpersist()
    return [(v, lam)]


_PQ_SUBS_SLOT: list = []


def _dot_cols(a: Column, b: Column) -> Column:
    """Sequential-fold dot(array column, array column) — the same
    index-order fold as _dot_literal / DuckDB's list_dot_product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_topk(
    emb: DataFrame, query_id: int = 0, k: int = 10, n_candidates: int = 50,
    num_subspaces: int = 4, num_codes: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN top-k (Jegou/Douze/Schmid, PAMI 2011):
    vectors are split into ``num_subspaces`` subvectors, each assigned to
    its nearest codeword (L2, same deterministic-sample codebook
    convention as the IVF path: the subvectors of the first
    ``num_codes`` ids), the query's asymmetric distance (ADC — here the
    approximate DOT, the sum of per-subspace query-codeword dots) ranks
    candidates, and the ``n_candidates`` survivors are rescored with the
    exact cosine. The memory story at scale: a dim-d float vector
    becomes num_subspaces bytes of codes, and query scoring is a
    (subspace, code) table lookup instead of d multiplies.

    Plan shape: codebook and ADC lookup are broadcast
    (num_subspaces * num_codes rows); assignment is ONE broadcast join +
    map-side min_by per (id, subspace) — the shuffle carries one row per
    (id, subspace), never the scored fan-out; candidate top-n and final
    top-k are TakeOrdered. Exactness discipline: every fold is the same
    index-order sequence both engines use, d2 is a fixed op chain over
    staged self-dots, and the per-id ADC is added subspace 0..S-1 in
    fixed order (one-row conditional sums), so candidate sets and ranks
    match the SQL oracle bit-for-bit. The exploded subvector table is
    persisted through the one-slot discipline (plans/cache.persist_slot)
    — codebook, assignment, and query-lookup branches all read it, which
    cuts the base-table scans from 5 to 2 (assignment+rescore); at
    production scale the codes would live as a stored table and the
    rescore would be the only vector scan."""
    import math

    from pyspark.sql import Window

    from mintpy_spark.plans.cache import persist_slot

    qrows = (
        emb.where(F.col(id_col) == query_id)
        .select(F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"))
        .collect()
    )
    if not qrows:
        raise ValueError(f"query_id {query_id} not found in {id_col}")
    qv = [float(x) for x in qrows[0]["qv"]]
    dim = len(qv)
    s_count, code_count = int(num_subspaces), int(num_codes)
    assert dim % s_count == 0, "num_subspaces must divide the dimension"
    sub_len = dim // s_count

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    slices = F.array(
        *[F.slice("_v", s * sub_len + 1, sub_len) for s in range(s_count)]
    )
    subs = persist_slot(
        emb.select(id_col, v.alias("_v"))
        .select(id_col, F.posexplode(slices).alias("s", "sub"))
        .withColumn("_dxx", _dot_cols(F.col("sub"), F.col("sub"))),
        _PQ_SUBS_SLOT,
    )
    cb = subs.where(F.col(id_col) < code_count).select(
        F.col("s").alias("cs"),
        F.col(id_col).alias("code"),
        F.col("sub").alias("cvec"),
        F.col("_dxx").alias("_dcc"),
    )
    scored = subs.join(
        F.broadcast(cb), F.col("s") == F.col("cs")
    ).withColumn(
        "_d2",
        F.col("_dxx")
        - F.lit(2.0) * _dot_cols(F.col("sub"), F.col("cvec"))
        + F.col("_dcc"),
    )
    codes = scored.groupBy(id_col, "s").agg(
        F.expr("min_by(code, struct(_d2, code))").alias("code")
    )
    qd = (
        subs.where(F.col(id_col) == query_id)
        .join(F.broadcast(cb), F.col("s") == F.col("cs"))
        .select("s", "code", _dot_cols(F.col("sub"), F.col("cvec")).alias("_qd"))
    )
    parts = [
        F.sum(F.when(F.col("s") == i, F.col("_qd"))).alias(f"_a{i}")
        for i in range(s_count)
    ]
    adc_sum = F.col("_a0")
    for i in range(1, s_count):
        adc_sum = adc_sum + F.col(f"_a{i}")
    cand = (
        codes.where(F.col(id_col) != query_id)
        .join(F.broadcast(qd), ["s", "code"])
        .groupBy(id_col)
        .agg(*parts)
        .select(id_col, adc_sum.alias("adc"))
        .orderBy(F.desc("adc"), F.asc(id_col))
        .limit(int(n_candidates))
    )
    qnorm = math.sqrt(sum(x * x for x in qv))
    staged = emb.select(id_col, v.alias("_v")).withColumn(
        "_vn", _vnorm(F.col("_v"))
    )
    rescored = (
        staged.join(F.broadcast(cand), id_col)
        .withColumn(
            "_cos", _dot_literal(F.col("_v"), qv) / (F.col("_vn") * F.lit(qnorm))
        )
        .orderBy(F.desc("_cos"), F.asc(id_col))
        .limit(int(k))
    )
    w = Window.orderBy(F.desc("_cos"), F.asc(id_col))
    return rescored.select(
        F.row_number().over(w).cast("long").alias("rank"),
        id_col,
        F.round("adc", 4).alias("pq_dot"),
        F.round("_cos", 4).alias("cos_sim"),
    )


def pq_oracle_sql(
    table: str = "embeddings", query_id: int = 0, k: int = 10,
    n_candidates: int = 50, num_subspaces: int = 4, num_codes: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding", dim: int = 64,
) -> str:
    """DuckDB re-execution of the PQ path: same sample codebook, same
    staged d2 chain, same fixed-order ADC sum, same exact-cosine rescore."""
    sub_len = dim // num_subspaces
    adc_terms = "\n           + ".join(
        f"SUM(CASE WHEN c.s = {i} THEN qd.qdot END)"
        for i in range(num_subspaces)
    )
    return f"""
    WITH e AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {table}),
    subs AS (
      SELECT {id_col}, s,
             list_slice(v, s * {sub_len} + 1, (s + 1) * {sub_len}) AS sub
      FROM e, UNNEST(range(0, {num_subspaces})) AS r(s)
    ),
    subx AS (
      SELECT {id_col}, s, sub, list_dot_product(sub, sub) AS dxx FROM subs
    ),
    cb AS (
      SELECT s, {id_col} AS code, sub AS cvec, dxx AS dcc
      FROM subx WHERE {id_col} < {num_codes}
    ),
    scored AS (
      SELECT subx.{id_col}, subx.s, cb.code,
             subx.dxx - 2.0 * list_dot_product(subx.sub, cb.cvec) + cb.dcc
               AS d2
      FROM subx JOIN cb ON subx.s = cb.s
    ),
    codes AS (
      SELECT {id_col}, s, code FROM (
        SELECT {id_col}, s, code,
               row_number() OVER (PARTITION BY {id_col}, s
                                  ORDER BY d2 ASC, code ASC) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    qd AS (
      SELECT cb.s, cb.code, list_dot_product(q.sub, cb.cvec) AS qdot
      FROM subx q JOIN cb ON q.s = cb.s WHERE q.{id_col} = {query_id}
    ),
    adc AS (
      SELECT c.{id_col},
           {adc_terms} AS adc
      FROM codes c JOIN qd ON c.s = qd.s AND c.code = qd.code
      WHERE c.{id_col} <> {query_id}
      GROUP BY c.{id_col}
    ),
    cand AS (
      SELECT * FROM adc ORDER BY adc DESC, {id_col} ASC LIMIT {n_candidates}
    ),
    q AS (SELECT v AS qv FROM e WHERE {id_col} = {query_id})
    SELECT CAST(row_number() OVER (ORDER BY cos_raw DESC, {id_col} ASC)
                AS BIGINT) AS rank,
           {id_col}, ROUND(adc, 4) AS pq_dot, ROUND(cos_raw, 4) AS cos_sim
    FROM (
      SELECT cand.{id_col}, cand.adc,
             list_dot_product(e.v, q.qv)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(q.qv, q.qv))) AS cos_raw
      FROM cand JOIN e ON cand.{id_col} = e.{id_col}, q
      ORDER BY cos_raw DESC, cand.{id_col} ASC LIMIT {k}
    )
    """
