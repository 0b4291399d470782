"""Deterministic hash-based sampling & splitting for training-data curation.

A 10^12-doc corpus is sampled/split by a STABLE content-independent hash of
the document id — never by rand(): reruns, resumed jobs, and different
cluster sizes must all assign every document to the same stratum sample and
train/val/test split (the reproducibility invariant of dataset curation
pipelines). The hash is the cross-engine md5 recipe (first 15 hex chars as
a 60-bit integer — see functions/scalars.py and the dedup operators), so
the assignment is also verifiable row-for-row in any other engine.

All operators are single-projection Catalyst plans (zero shuffles until
the caller aggregates); rates are per-stratum via a broadcast map.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def stable_bucket(col: Column, buckets: int = 100, salt: str = "") -> Column:
    """Deterministic bucket in [0, buckets): md5 of the stringified id
    (plus an optional salt suffix ``:<salt>``), first 15 hex digits as a
    long (always non-negative), mod buckets. Distinct salts give
    INDEPENDENT bucket assignments for the same id — required whenever
    two decisions (e.g. split membership and sample membership) must not
    correlate. Cross-engine: DuckDB
    ('0x' || substring(md5(x [|| ':salt']), 1, 15))::BIGINT."""
    from mintpy_spark.functions.scalars import portable_hash60

    s = col.cast("string")
    if salt:
        s = F.concat(s, F.lit(":" + salt))
    return F.pmod(portable_hash60(s), F.lit(int(buckets)))


def with_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    split_col: str = "split",
) -> DataFrame:
    """train/val/test assignment by stable bucket: [0, train) -> train,
    [train, train+val) -> val, rest -> test. Holdout membership never
    changes as the corpus grows — a document's split depends only on its
    own id."""
    b = stable_bucket(F.col(id_col))
    return df.withColumn(
        split_col,
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    rates_pct: dict[str, int] | None = None,
    default_pct: int = 100,
    flag_col: str = "sampled",
) -> DataFrame:
    """Per-stratum downsampling flag: keep a document iff its SALTED
    stable bucket falls below its stratum's percentage (e.g. downweight
    English to 10% while keeping low-resource languages whole — the
    standard language-balancing pass). The rate map is a small literal
    CASE (broadcast-free).

    The sampling bucket is salted (``:sample``) so it is INDEPENDENT of
    the un-salted split bucket in :func:`with_split` — sharing one hash
    would make a 10% sample exactly the first tenth of the train range:
    zero val/test documents survive the sampling. With independent
    hashes, sub-sampling a stratum preserves its train/val/test
    proportions in expectation."""
    rates = rates_pct or {}
    b = stable_bucket(F.col(id_col), salt="sample")
    rate: Column = F.lit(int(default_pct))
    for s, p in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == s, F.lit(int(p))).otherwise(rate)
    return df.withColumn(flag_col, b < rate)


def quota_sample(
    df: DataFrame,
    key: str = "source",
    id_col: str = "doc_id",
    k: int = 10,
    salt: str = "quota",
) -> DataFrame:
    """Deterministic per-key quota sample: keep at most ``k`` rows per
    key, chosen by ranking on the salted portable 60-bit hash of the id
    (ties broken by id). The curation counterpart of the stratified
    split: caps over-represented sources so no domain dominates a
    training shard (the "source mixing" step every corpus recipe runs),
    while the hash ranking makes membership (a) uniform, (b) stable
    under re-runs and data re-partitioning, and (c) INDEPENDENT of the
    split/sample decisions made with other salts.

    Returns the kept rows: (key, id_col, rk) with rk in [1, k].

    Plan shape: one hash Exchange on the key + a rank window — at
    100 TB the pre-filter `row_number <= k` is the textbook top-k
    window; a hot key still sorts its whole partition slice, so for
    pathological skew the standard two-phase cheapening is a salted
    pre-top-k (top-k within (key, salt-bucket), then top-k of the
    k*B survivors) — decomposable because hash-rank top-k is a
    min-heap merge. This exact one-pass form is the oracle baseline.
    """
    from pyspark.sql import Window

    from mintpy_spark.functions.scalars import portable_hash60

    h = portable_hash60(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    )
    w = Window.partitionBy(key).orderBy("_h", id_col)
    return (
        df.select(F.col(key), F.col(id_col), h.alias("_h"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(key, id_col, F.col("rk").cast("int").alias("rk"))
    )


def priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    group_cols: tuple[str, ...] = (),
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling without replacement: priority
    sampling (Duffield, Lund & Thorup, JACM 2007 — public literature).
    Each row gets priority q = w / u with u = (h+1)/2^60 a stable
    uniform from the portable id hash; the k highest-priority rows per
    group are the sample, and est_w = max(w, tau) (tau = the (k+1)-th
    priority) is the Horvitz-Thompson-style weight estimator whose
    per-subset sums are unbiased. Groups with <= k rows return whole
    (tau undefined -> est_w = w exactly).

    Determinism & parity: u is hash-derived (reruns/resumes/cluster
    sizes agree; the same rows sample in any engine), and q uses ONLY
    multiply/divide on doubles — IEEE-exact-rounded, bit-identical in
    Spark, DuckDB and NumPy (no exp/log/pow whose libm rounding could
    flip a rank at the k boundary). Ties break on id.

    Plan: one projection + one window rank per group — a single
    Exchange on the group key; at 10^12 rows this is the standard
    "sample each stratum's top-k by priority" shape (per-group top-k
    pushes partial TopK under the shuffle via the rank filter)."""
    from mintpy_spark.functions.scalars import portable_hash60

    s = F.col(id_col).cast("string")
    if salt:
        s = F.concat(s, F.lit(":" + salt))
    # q = w * 2^60 / (h+1): double multiply + divide only (see above)
    q = (
        F.col(weight_col).cast("double")
        * F.lit(float(2**60))
        / (portable_hash60(s) + F.lit(1)).cast("double")
    )
    w_ord = Window.partitionBy(*group_cols).orderBy(
        F.col("_q").desc(), F.col(id_col).asc()
    )
    w_all = Window.partitionBy(*group_cols)
    ranked = (
        df.withColumn("_q", q)
        .withColumn("_rn", F.row_number().over(w_ord))
        .withColumn(
            "_tau",
            F.max(F.when(F.col("_rn") == k + 1, F.col("_q"))).over(w_all),
        )
    )
    return (
        ranked.where(F.col("_rn") <= k)
        .select(
            *group_cols,
            id_col,
            F.col(weight_col),
            F.col("_rn").alias("rank"),
            F.greatest(
                F.col(weight_col).cast("double"),
                F.coalesce(F.col("_tau"), F.lit(0.0)),
            ).alias("est_w"),
        )
    )
