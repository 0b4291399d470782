"""Mergeable distinct-count sketch tier: K-Minimum-Values (KMV).

The histogram tier (operators/rollup.py) answers approximate quantiles
from any tier; this module does the same for COUNT(DISTINCT): a KMV
sketch (Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream", public literature) kept per tier bucket. The sketch is the set
of the k smallest *distinct* hash values seen in the bucket; its
fundamental property is loss-free mergeability —

    k-smallest(distinct(A ∪ B)) == k-smallest(distinct(
        k-smallest(distinct(A)) ∪ k-smallest(distinct(B))))

— so coarse tiers merge fine-tier sketches without touching raw data,
exactly like cnt/vsum/vmin/vmax partials. The driver oracle leans on that
theorem: Spark builds the 1d sketch by MERGING 1h sketches, DuckDB builds
it directly from raw rows, and the results must be hash-identical (not
approximately equal) — the merge path is provably exact, only the
*estimate* is approximate.

Hash: the engine-portable md5-prefix hash (memory: cross-engine integer
hash) — ``conv(substr(md5(x), 1, 15), 16, 10)`` — uniform on
[0, 16^15); the estimator is the classic (k-1) * H / h_(k) with
H = 16^15, computed in double arithmetic identically on both engines.

No reference analog (MintPy has no distinct-count path); this is a
first-class tier component for the web-scale recast (distinct urls per
domain per day at 10^12 rows cannot be exact without a full shuffle of
the key space — the sketch is one narrow agg per tier bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = float(16**15)  # md5 15-hex-digit prefix, ~2^60


def portable_hash(col: Column) -> Column:
    """Engine-portable uniform hash of a string column -> long in
    [0, 16^15). Identical to DuckDB's
    ``('0x' || substring(md5(x), 1, 15))::BIGINT``. Delegates to the
    single recipe in functions/scalars.portable_hash60."""
    from mintpy_spark.functions.scalars import portable_hash60

    return portable_hash60(col)


def kmv_tier(
    obs: DataFrame,
    item_col: str,
    tier: str = "1h",
    key_cols: tuple[str, ...] = (),
    ts: str = "warc_ts",
    k: int = 32,
) -> DataFrame:
    """Raw rows -> per-bucket KMV sketch: (key..., bucket_start, kmv
    array<long> of the <=k smallest distinct item hashes, ascending)."""
    from mintpy_spark.functions.timefn import bucket_start

    staged = (
        obs.select(
            *key_cols,
            bucket_start(F.col(ts), tier).alias("bucket_start"),
            portable_hash(F.col(item_col)).alias("_h"),
        )
        # NULL items hash to NULL; distinct-count semantics ignore NULL,
        # and a NULL must never occupy a rank slot (NULLS FIRST would
        # displace the k-th smallest real hash and shrink the sketch).
        .where(F.col("_h").isNotNull())
        .dropDuplicates([*key_cols, "bucket_start", "_h"])
    )
    w = Window.partitionBy(*key_cols, "bucket_start").orderBy("_h")
    return (
        staged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .groupBy(*key_cols, "bucket_start")
        .agg(F.sort_array(F.collect_list("_h")).alias("kmv"))
    )


def kmv_merge(
    sketch_df: DataFrame,
    to_tier: str,
    key_cols: tuple[str, ...] = (),
    k: int = 32,
) -> DataFrame:
    """Merge fine-tier sketches into a coarser tier: explode the hash
    arrays, re-bucket, dedupe, keep the k smallest — the loss-free merge
    (see module docstring). Cost is O(k) rows per fine bucket, never the
    raw data."""
    from mintpy_spark.functions.timefn import bucket_start

    exploded = sketch_df.select(
        *key_cols,
        bucket_start(F.col("bucket_start"), to_tier).alias("bucket_start"),
        F.explode("kmv").alias("_h"),
    ).dropDuplicates([*key_cols, "bucket_start", "_h"])
    w = Window.partitionBy(*key_cols, "bucket_start").orderBy("_h")
    return (
        exploded.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .groupBy(*key_cols, "bucket_start")
        .agg(F.sort_array(F.collect_list("_h")).alias("kmv"))
    )


def kmv_estimate(sketch_df: DataFrame, k: int = 32) -> DataFrame:
    """Sketch -> (.., n_kept, kth_min, est_distinct).

    Exact when the bucket held fewer than k distinct items (the sketch IS
    the distinct set); otherwise the unbiased KMV estimator
    (k-1) * H / h_(k) rounded to 2 dp in double arithmetic (identical
    expression on the oracle side)."""
    n_kept = F.size("kmv")
    kth = F.element_at("kmv", -1)
    est = F.when(n_kept < k, n_kept.cast("double")).otherwise(
        F.round(F.lit(k - 1) * F.lit(HASH_SPACE) / kth.cast("double"), 2)
    )
    return sketch_df.select(
        *[c for c in sketch_df.columns if c != "kmv"],
        n_kept.alias("n_kept"),
        kth.alias("kth_min"),
        est.alias("est_distinct"),
    )
