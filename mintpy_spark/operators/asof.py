"""As-of (temporal nearest-prior) join.

Reference analog: GNSS-vs-InSAR comparison joins an irregular GNSS series
to SAR acquisition dates by most-recent-observation
(reference: src/mintpy/objects/insar_vs_gnss.py, ~300 LoC driver around a
per-site temporal alignment). The generic operator: for every left row
(key, ts), attach the latest right row (key, ts_r <= ts).

Implementation is the union-sort-window strategy, not a join:

    union(left-as-probe, right-as-obs)
      -> window last(value, ignorenulls) over (key ORDER BY ts, is_probe)
      -> keep probes

One shuffle on ``key`` total, no range-join explosion, no per-key loop —
this is the shape that survives 100 TB (a sort-merge range join would
re-shuffle both sides *and* risk unbounded range-match fan-out; the window
scan is linear per key). Ties (obs at exactly the probe ts) sort before the
probe, so probe@t sees obs@t — ASOF '<=' semantics, matching DuckDB's
ASOF JOIN which the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str] | None = None,
    right_ts_alias: str = "asof_ts",
    direction: str = "backward",
) -> DataFrame:
    """Attach to each ``left`` row the nearest ``right`` row per key:
    ``direction='backward'`` (default) the latest with right.ts <= left.ts,
    ``direction='forward'`` the earliest with right.ts >= left.ts. NULLs
    where no such row exists. Both directions are the same one-shuffle
    union-sort-window scan, mirrored: the tie ordering puts obs before
    probe (backward) or after (forward) so an observation at exactly the
    probe timestamp matches in either direction.

    ``value_cols`` defaults to every right column except key/ts. If the
    right side has several rows at one (key, ts), the window keeps the
    nearest in scan order within that timestamp — deduplicate upstream if
    that ambiguity matters (the oracle data is unique per (key, ts)).

    The whole right payload travels as ONE struct through a single
    ignorenulls window — per-column windows would each skip their own
    NULLs and stitch values and ``asof_ts`` from DIFFERENT right rows
    (e.g. value from an old row with the timestamp of a newer NULL-valued
    row — also breaking the staleness check in asof_join_tolerance).
    A right row with NULL values IS the as-of match and yields NULL
    payload, exactly like DuckDB's ASOF JOIN; right rows with a NULL
    timestamp can never satisfy the as-of predicate and are dropped.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key, ts)]

    rstruct = F.struct(
        F.col(ts).alias("__rts"), *[F.col(c).alias(c) for c in value_cols]
    )
    stype = right.select(rstruct.alias("_r")).schema["_r"].dataType
    probes = left.select(
        key, ts, F.lit(1).alias("_is_probe"),
        F.lit(None).cast(stype).alias("_r"),
    )
    obs = right.where(F.col(ts).isNotNull()).select(
        key, ts, F.lit(0).alias("_is_probe"), rstruct.alias("_r"),
    )
    if direction == "backward":
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(ts).asc(), F.col("_is_probe").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(ts).asc(), F.col("_is_probe").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    filled = obs.unionByName(probes).select(
        key, ts, "_is_probe", pick("_r").alias("_f")
    )
    out_cols = [key, ts] + [
        F.col(f"_f.{c}").alias(c) for c in value_cols
    ]
    out_cols.append(F.col("_f.__rts").alias(right_ts_alias))
    return filled.where(F.col("_is_probe") == 1).select(*out_cols)


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    tolerance_seconds: int,
    value_cols: list[str] | None = None,
    right_ts_alias: str = "asof_ts",
    direction: str = "backward",
) -> DataFrame:
    """As-of join with a maximum-staleness bound: matches farther than
    ``tolerance_seconds`` from the probe are nulled out (probe rows are
    KEPT, with NULL payload — left-join semantics).

    Reference analog: insar_vs_gnss temporal alignment discards GNSS
    observations farther than a day from the SAR acquisition. Runs as the
    same one-shuffle union-sort-window scan as asof_join plus a row-local
    conditional — no extra shuffle. pandas.merge_asof(tolerance=...)
    semantics."""
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key, ts)]
    out = asof_join(
        left, right, key, ts,
        value_cols=value_cols, right_ts_alias=right_ts_alias,
        direction=direction,
    )
    # microsecond precision: a whole-second cast truncates, flipping rows
    # whose gap is in (tol, tol+1) s vs an interval-compare oracle
    gap = F.abs(
        F.unix_micros(F.col(ts).cast("timestamp"))
        - F.unix_micros(F.col(right_ts_alias).cast("timestamp"))
    )
    keep = F.col(right_ts_alias).isNotNull() & (
        gap <= F.lit(int(tolerance_seconds) * 1_000_000)
    )
    cols = []
    for c in out.columns:
        if c == right_ts_alias or c in value_cols:
            cols.append(F.when(keep, F.col(c)).alias(c))
        else:
            cols.append(F.col(c))
    return out.select(*cols)


def asof_interpolate(
    probes: DataFrame,
    obs: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Linear-interpolated as-of alignment: for every probe row
    (key, ts), the signal series' value AT that instant — linear between
    the bracketing observations, last-observation-carried-forward past
    the last one, next-observation-carried-backward before the first
    (the TimescaleDB ``interpolate()``/kdb ``aj``-with-fill analog; the
    reference's counterpart is resampling GNSS displacement onto SAR
    acquisition epochs, insar_vs_gnss.py).

    Same union-sort-window strategy as asof_join — ONE shuffle on
    ``key``, both brackets from one ordered pass (prev via
    last(ignorenulls) over the preceding frame, next via
    first(ignorenulls) over the following frame), no range join and no
    fan-out. An observation exactly at the probe timestamp sorts before
    the probe, lands in the preceding frame, and the interpolation
    factor degenerates to 0 — the exact value is returned.

    Exactness: the factor is integer-microsecond deltas divided once;
    the interpolation is a fixed op chain (prev + (next-prev)*f), so
    both engines agree bit-for-bit. Duplicate observation timestamps are
    ordered by ``order_cols`` (pass a unique id) and a next_t == prev_t
    degenerate bracket falls back to prev's value.

    Output: the probe rows + ``v_interp`` + ``method``
    ('interp'|'locf'|'nocb'|'none')."""
    mic = F.unix_micros(F.col(ts).cast("timestamp"))
    p = probes.select(
        key, F.col(ts).alias(ts), *order_cols,
        F.lit(1).alias("_isp"), F.lit(None).cast("double").alias("_v"),
    )
    o = obs.select(
        key, F.col(ts).alias(ts), *order_cols,
        F.lit(0).alias("_isp"), F.col(value_col).cast("double").alias("_v"),
    )
    u = p.unionByName(o).withColumn("_us", mic)
    order = [F.col(ts), F.col("_isp"), *[F.col(c) for c in order_cols]]
    wprev = (
        Window.partitionBy(key).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wnext = (
        Window.partitionBy(key).orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_struct = F.when(
        F.col("_isp") == 0, F.struct(F.col("_us").alias("t"), F.col("_v").alias("v"))
    )
    staged = (
        u.withColumn("_prev", F.last(obs_struct, ignorenulls=True).over(wprev))
        .withColumn("_next", F.first(obs_struct, ignorenulls=True).over(wnext))
        .where(F.col("_isp") == 1)
    )
    pt, pv = F.col("_prev.t"), F.col("_prev.v")
    nt, nv = F.col("_next.t"), F.col("_next.v")
    frac = (F.col("_us") - pt) / (nt - pt)
    v_interp = (
        F.when(F.col("_prev").isNull() & F.col("_next").isNull(),
               F.lit(None).cast("double"))
        .when(F.col("_prev").isNull(), nv)
        .when(F.col("_next").isNull(), pv)
        .when(nt > pt, pv + (nv - pv) * frac)
        .otherwise(pv)
    )
    method = (
        F.when(F.col("_prev").isNull() & F.col("_next").isNull(), F.lit("none"))
        .when(F.col("_prev").isNull(), F.lit("nocb"))
        .when(F.col("_next").isNull(), F.lit("locf"))
        .otherwise(F.lit("interp"))
    )
    return staged.select(
        key, ts, *order_cols,
        v_interp.alias("v_interp"), method.alias("method"),
    )


def asof_nearest(
    probes: DataFrame,
    obs: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Nearest-observation as-of alignment: for every probe row
    (key, ts), the observation with the smallest |Δt| — backward wins
    ties (the kdb ``aj`` nearest / pandas ``merge_asof(direction=
    'nearest')`` analog). Completes the as-of family next to backward
    (asof_join), forward, tolerance, and interpolated alignment.

    Same union-sort-window strategy — ONE shuffle on ``key``, both
    candidates from one ordered pass, no range join. Distances are
    exact integer microseconds, so the tie rule and the choice are
    engine-portable with no float anywhere.

    Output: probe rows + ``v_nearest`` + ``asof_ts_us`` (chosen
    observation's microsecond timestamp) + ``dist_us`` + ``side``
    ('prev'|'next'|'none')."""
    mic = F.unix_micros(F.col(ts).cast("timestamp"))
    p = probes.select(
        key, F.col(ts).alias(ts), *order_cols,
        F.lit(1).alias("_isp"), F.lit(None).cast("double").alias("_v"),
    )
    o = obs.select(
        key, F.col(ts).alias(ts), *order_cols,
        F.lit(0).alias("_isp"), F.col(value_col).cast("double").alias("_v"),
    )
    u = p.unionByName(o).withColumn("_us", mic)
    order = [F.col(ts), F.col("_isp"), *[F.col(c) for c in order_cols]]
    wprev = (
        Window.partitionBy(key).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wnext = (
        Window.partitionBy(key).orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_struct = F.when(
        F.col("_isp") == 0,
        F.struct(F.col("_us").alias("t"), F.col("_v").alias("v")),
    )
    staged = (
        u.withColumn("_prev", F.last(obs_struct, ignorenulls=True).over(wprev))
        .withColumn("_next", F.first(obs_struct, ignorenulls=True).over(wnext))
        .where(F.col("_isp") == 1)
    )
    dp = F.col("_us") - F.col("_prev.t")
    dn = F.col("_next.t") - F.col("_us")
    use_prev = F.col("_next").isNull() | (
        F.col("_prev").isNotNull() & (dp <= dn)
    )
    chosen = F.when(use_prev, F.col("_prev")).otherwise(F.col("_next"))
    side = (
        F.when(F.col("_prev").isNull() & F.col("_next").isNull(),
               F.lit("none"))
        .when(use_prev, F.lit("prev"))
        .otherwise(F.lit("next"))
    )
    return staged.select(
        key, ts, *order_cols,
        F.col("_us").alias("probe_us"),
        chosen["v"].alias("v_nearest"),
        chosen["t"].alias("asof_ts_us"),
        F.when(chosen.isNotNull(), F.abs(F.col("_us") - chosen["t"]))
        .alias("dist_us"),
        side.alias("side"),
    )
