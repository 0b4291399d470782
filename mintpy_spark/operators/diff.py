"""Series algebra: diffs, pairwise deltas, temporal derivative.

Recasts the reference's schema-aligned binary dataset combinations
(SURVEY.md §2.3; reference: src/mintpy/diff.py, src/mintpy/add.py,
objects/stack.py:459-478) as equi-joins / windows on (key, ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def diff_series(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    how: str = "inner",
    key: str = "url",
    ts: str = "warc_ts",
) -> DataFrame:
    """a - b on shared (key, ts) — diff_timeseries (diff.py:58-149).

    how='inner' keeps only shared timestamps (the default there); 'left'
    mirrors ``--force`` (missing b treated as 0, diff.py:100-104).
    """
    bb = b.select(key, ts, F.col(value_col).alias("_b"))
    joined = a.join(bb, [key, ts], how)
    rhs = F.coalesce(F.col("_b"), F.lit(0.0)) if how == "left" else F.col("_b")
    return joined.select(key, ts, (F.col(value_col) - rhs).alias(value_col))


def add_series(
    dfs: list[DataFrame], value_col: str, key: str = "url", ts: str = "warc_ts"
) -> DataFrame:
    """N-way sum with NaN-union semantics (add.py:18-87: a cell is null only
    if null in all inputs; otherwise nulls count as 0)."""
    out = None
    for i, df in enumerate(dfs):
        cur = df.select(key, ts, F.col(value_col).alias(f"_v{i}"))
        out = cur if out is None else out.join(cur, [key, ts], "outer")
    vals = [F.col(f"_v{i}") for i in range(len(dfs))]
    all_null = F.coalesce(*vals).isNull() if len(vals) > 1 else vals[0].isNull()
    total = sum((F.coalesce(v, F.lit(0.0)) for v in vals[1:]), F.coalesce(vals[0], F.lit(0.0)))
    return out.select(key, ts, F.when(all_null, None).otherwise(total).alias(value_col))


def pair_deltas(
    obs: DataFrame,
    value_col: str,
    max_lag: int = 1,
    key: str = "url",
    ts: str = "warc_ts",
) -> DataFrame:
    """Pairwise snapshot deltas — the interferogram-stack analog.

    For each key, emit (key, ts1, ts2, delta, tbase_days) for consecutive
    snapshot pairs up to connection level ``max_lag`` (the reference's
    sequential-network of connection level n, stack.py:1113-1143). Built
    with lead() windows: no self-join, one shuffle on key.
    """
    # ONE window pass computes every lead, then stack() unpivots to long
    # format — a union of per-lag subplans would scan and shuffle the fact
    # table once per connection level; this does it once total.
    w = Window.partitionBy(key).orderBy(ts)
    leads = obs.select(
        key,
        F.col(ts).alias("ts1"),
        *[F.lead(ts, lag).over(w).alias(f"_t{lag}") for lag in range(1, max_lag + 1)],
        *[
            (F.lead(value_col, lag).over(w) - F.col(value_col)).alias(f"_d{lag}")
            for lag in range(1, max_lag + 1)
        ],
    )
    stack_expr = f"stack({max_lag}, " + ", ".join(
        f"_t{lag}, _d{lag}" for lag in range(1, max_lag + 1)
    ) + ") as (ts2, delta)"
    out = leads.select(key, "ts1", F.expr(stack_expr)).where(
        F.col("ts2").isNotNull()
    )
    return out.withColumn(
        "tbase_days",
        (
            F.col("ts2").cast("timestamp").cast("double")
            - F.col("ts1").cast("timestamp").cast("double")
        )
        / 86400.0,
    )


def reconstruct_pair_from_series(
    series: DataFrame,
    pairs: DataFrame,
    value_col: str = "value",
    key: str = "url",
) -> DataFrame:
    """diff_ifgram_and_timeseries (diff.py:299): evaluate ts[d2]-ts[d1] for
    each pair via a double equi-join, subtract from the observed delta."""
    s1 = series.select(key, F.col("bucket_start").alias("ts1"), F.col(value_col).alias("_v1"))
    s2 = series.select(key, F.col("bucket_start").alias("ts2"), F.col(value_col).alias("_v2"))
    return (
        pairs.join(s1, [key, "ts1"])
        .join(s2, [key, "ts2"])
        .select(
            key,
            "ts1",
            "ts2",
            (F.col("delta") - (F.col("_v2") - F.col("_v1"))).alias("delta_residual"),
        )
    )


def temporal_derivative(
    obs: DataFrame, value_col: str, key: str = "url", ts: str = "warc_ts"
) -> DataFrame:
    """Lag-1 difference along time (stack.py:459-478 timeseries.diff);
    first epoch has no derivative (reference drops it)."""
    w = Window.partitionBy(key).orderBy(ts)
    return (
        obs.select(
            key,
            F.col(ts).alias(ts),
            (F.col(value_col) - F.lag(value_col).over(w)).alias("deriv"),
        )
        .where(F.col("deriv").isNotNull())
    )


def closure_triplet(
    obs: DataFrame, value_col: str, key: str = "url", ts: str = "warc_ts"
) -> DataFrame:
    """Sequential-triplet closure over consecutive snapshots.

    Reference analog: closure phase over sequential interferogram loops
    (stack.py:1113-1230): for dates (t1,t2,t3), misclosure of the three
    pairwise differences. For linear values d12+d23-d13 vanishes
    identically, so the engine reports the triangle slack
    |d12| + |d23| - |d13| >= 0 — a burstiness/monotonicity indicator (0
    iff the series moved monotonically across the triplet). One window
    scan, no join (the reference builds an explicit triplet design
    matrix; lead() over the per-key sort is the Spark-native form).
    """
    w = Window.partitionBy(key).orderBy(ts)
    v = F.col(value_col)
    v2, v3 = F.lead(value_col, 1).over(w), F.lead(value_col, 2).over(w)
    t2, t3 = F.lead(ts, 1).over(w), F.lead(ts, 2).over(w)
    return (
        obs.select(
            key,
            F.col(ts).alias("ts1"),
            t2.alias("ts2"),
            t3.alias("ts3"),
            (F.abs(v2 - v) + F.abs(v3 - v2) - F.abs(v3 - v)).alias("closure"),
        )
        .where(F.col("ts3").isNotNull())
    )


def stitch_series(
    a: DataFrame,
    b: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
    value_col: str = "value",
) -> DataFrame:
    """Union two overlapping tiles after overlap-offset harmonization.

    Reference analog: image_stitch.py:100 ``stitch_two_matrices`` — the
    mean difference over the overlap is added to the second tile, then the
    tiles merge (first tile wins on overlap). The offset is a 1-row
    aggregate broadcast into the adjustment (no second shuffle of b); the
    merge is unionByName + left-anti on the overlap keys.
    """
    av, bv = F.col(f"_a_{value_col}"), F.col(f"_b_{value_col}")
    aa = a.select(key, ts, F.col(value_col).alias(f"_a_{value_col}"))
    bb = b.select(key, ts, F.col(value_col).alias(f"_b_{value_col}"))
    offset = (
        aa.join(bb, [key, ts])
        .agg(F.coalesce(F.avg(av - bv), F.lit(0.0)).alias("_offset"))
    )
    b_adj = (
        b.crossJoin(F.broadcast(offset))
        .withColumn(value_col, F.col(value_col) + F.col("_offset"))
        .drop("_offset")
        .join(a.select(key, ts), [key, ts], "left_anti")
    )
    return a.unionByName(b_adj)
