"""Offline changepoint detection via exact-integer CUSUM over count tiers.

Reference analog: the step component of MintPy's time-function dictionary
(src/mintpy/objects/timefunc.py step/'step_date' regressors;
timeseries2velocity.py fits known step dates). This operator finds the
UNKNOWN step location: the classic CUSUM statistic over a per-key count
series — argmax_k |S_k - k/n * S_n| — locates the most likely mean shift.

Exactness at any scale: for integer count series the numerator
``D_k = n*S_k - k*S_n`` is exact 64-bit integer arithmetic, so the argmax
is reproducible bit-for-bit across engines and partitionings (no float
summation-order ambiguity — unlike a mean-subtracted float CUSUM, whose
near-cancellation makes the argmax flip at ulp level). Counts come from the
1d tier, so the scan is tier-sized, not raw-sized.

Plan shape: one hash aggregation to the 1d counts + one window over the
series key (both shuffle on the same key — with the tier stored
hash-partitioned on key, a single Exchange) + a rank filter. Streaming
counterpart: streaming/change_detect.py (stateful online detector).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mintpy_spark.functions.timefn import bucket_start


def daily_counts(
    obs: DataFrame, key: str = "url", ts: str = "warc_ts", tier: str = "1d"
) -> DataFrame:
    """(key, bucket_start, c): per-bucket observation counts."""
    return (
        obs.select(key, bucket_start(F.col(ts), tier).alias("bucket_start"))
        .groupBy(key, "bucket_start")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cusum_changepoint(
    counts: DataFrame, key: str = "url"
) -> DataFrame:
    """(key, cp_bucket, max_dev_n, n_buckets): the bucket k maximizing the
    integer CUSUM deviation |n*S_k - k*S_n| (ties -> earliest bucket);
    ``max_dev_n`` is that exact integer numerator (the deviation scaled by
    n_buckets)."""
    seq = Window.partitionBy(key).orderBy("bucket_start")
    whole = Window.partitionBy(key)
    run = (
        counts.withColumn("_sk", F.sum("c").over(
            seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("_k", F.row_number().over(seq))
        .withColumn("_sn", F.sum("c").over(whole))
        .withColumn("_n", F.count(F.lit(1)).over(whole))
        .withColumn(
            "_dev",
            F.abs(F.col("_n") * F.col("_sk") - F.col("_k") * F.col("_sn")),
        )
    )
    pick = Window.partitionBy(key).orderBy(F.desc("_dev"), F.asc("bucket_start"))
    return (
        run.withColumn("_rk", F.row_number().over(pick))
        .where(F.col("_rk") == 1)
        .select(
            key,
            F.col("bucket_start").alias("cp_bucket"),
            F.col("_dev").alias("max_dev_n"),
            F.col("_n").alias("n_buckets"),
        )
    )
