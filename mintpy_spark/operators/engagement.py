"""Engagement census operators: rolling-window distinct actives
(DAU/WAU/stickiness) and time-in-state dwell aggregation.

Reference analog: MintPy's temporal-coverage accounting — the per-date
observation masks behind ``timeseries.py`` date selection and the
nonzero/common-mask ALL-aggregates (``objects/stack.py:972``) — recast
as the product-analytics staples over the events stream:

* ``daily_actives`` — DAU plus exact rolling-7-day distinct actives
  (WAU).  Exact sliding count-distinct does NOT decompose into
  mergeable partials, so the scale-safe form is the interval-cover
  explode: each distinct (user, day) contributes to exactly ``window``
  window-ends — a bounded fan-out independent of per-day event volume —
  then a second distinct collapses multi-day users per window.  Both
  aggs are hash aggs with map-side partial combine; no unbounded
  window-function state.
* ``state_dwell`` — the TimescaleDB ``state_agg`` analog: a row enters
  its state at its own timestamp and exits at the user's next event
  (MintPy's acquisition-interval ``tbase_diff`` between consecutive
  epochs, ``timeseries2velocity`` setup).  Microsecond integers
  end-to-end so the DuckDB oracle (``epoch_us``) matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mintpy_spark.operators.bitmap import epoch_day


def daily_actives(
    events: DataFrame,
    window: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(ed, dau, wau, stickiness_bp) for every day with direct activity.

    ``wau`` is the EXACT distinct-user count over the trailing ``window``
    days ending at ``ed``; ``stickiness_bp`` = round(dau / wau) in basis
    points (the DAU/MAU-style engagement ratio).

    Plan: distinct (user, day) — Exchange 1, volume = distinct user-days,
    not raw events; then ONE cover explode (bounded x``window`` fan-out)
    feeding a single agg that computes DAU (count of offset-0 tags) and
    WAU (count distinct user) together — no branch split, no join.
    Output restricted to days that themselves have activity (dau > 0),
    so a silent day inside a busy week emits no row.
    """
    assert window >= 1
    # NULL users are excluded on BOTH engines: count_distinct drops NULL
    # while the dau tag-sum would keep it, so an anonymous row would make
    # dau exceed wau and fork from the oracle (review finding)
    ud = (
        events.where(F.col(user_col).isNotNull())
        .select(F.col(user_col).alias("user_id"), epoch_day(ts_col).alias("ed"))
        .distinct()
    )
    # ONE downstream pass: each distinct user-day fans into its `window`
    # covered window-ends, tagged whether it is the self-day (offset 0).
    # DAU(wd) = count of self-tags (unique per (user, wd) since ud is
    # distinct); WAU(wd) = count DISTINCT user (a user active on several
    # in-window days collapses). No dau/wau branch split, no join — the
    # earlier two-branch form cost 5 Exchanges / 2 scans.
    cover = ud.select(
        "user_id",
        "ed",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(window - 1).cast("long"))
        ).alias("_i"),
    )
    agg = (
        cover.groupBy((F.col("ed") + F.col("_i")).alias("wd"))
        .agg(
            F.sum((F.col("_i") == 0).cast("long")).alias("dau"),
            F.count_distinct("user_id").alias("wau"),
        )
        .where(F.col("dau") > 0)  # only days with direct activity
    )
    return agg.select(
        F.col("wd").alias("ed"),
        F.col("dau").cast("long").alias("dau"),
        F.col("wau").cast("long").alias("wau"),
        F.floor(F.col("dau") * 10000.0 / F.col("wau") + 0.5)
        .cast("long")
        .alias("stickiness_bp"),
    )


def state_dwell(
    events: DataFrame,
    state_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(state, entries, total_us, max_us, mean_us): time spent in each
    state across all users.  A row enters ``state_col`` at its own
    timestamp and exits at the user's next event; each user's last event
    has no exit and contributes no dwell (no censoring invented).

    Ties on the timestamp are broken on ``tiebreak_col`` so the lead()
    pairing is deterministic and identical in the oracle.  Plan: ONE
    Exchange on ``user_col`` for the lead window (Spark sorts within
    partitions; no global sort), then a |states|-bounded hash agg.
    """
    w = Window.partitionBy(user_col).orderBy("_us", tiebreak_col)
    seg = (
        events.select(
            user_col,
            F.col(state_col).alias("state"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
            tiebreak_col,
        )
        .withColumn("_dwell", F.lead("_us").over(w) - F.col("_us"))
        .where(F.col("_dwell").isNotNull())
    )
    return seg.groupBy("state").agg(
        F.count(F.lit(1)).cast("long").alias("entries"),
        F.sum("_dwell").cast("long").alias("total_us"),
        F.max("_dwell").cast("long").alias("max_us"),
        F.floor(F.sum("_dwell") * 1.0 / F.count(F.lit(1)) + 0.5)
        .cast("long")
        .alias("mean_us"),
    )


def growth_accounting(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(ed, new_users, retained, resurrected, churned): the classic
    growth-accounting decomposition of daily actives.

    Per active (user, day): NEW if the user was never active before,
    RETAINED if active the previous calendar day, RESURRECTED if
    returning after a gap >= 2 days.  CHURNED on day d = users active on
    d-1 but not on d (attributed to d via the lead gap).  Identity:
    dau(d) = new + retained + resurrected, and
    retained(d) = dau(d-1) - churned(d) — both assertable in tests.

    Output rows are the ACTIVE days (a day with churn but zero activity
    emits no row — restatement-free, same policy as daily_actives).

    Plan: distinct (user, day) — Exchange 1; ONE lag+lead window pass
    per user — Exchange 2 (partition-local sort, both offsets in the
    same window spec); each row then emits 1-2 CONTRIBUTION rows (its
    own day's class tally, plus a churn tally on day+1 when the lead gap
    opens) so a SINGLE day-keyed hash agg produces all four columns — no
    second window evaluation, no day-table join (the two-branch form
    replayed the distinct+window per branch).  Reference analog:
    MintPy's per-date coverage deltas (which acquisitions appear /
    disappear between consecutive epochs) in the network-modification
    step.
    """
    # NULL users excluded (same parity rationale as daily_actives)
    ud = (
        events.where(F.col(user_col).isNotNull())
        .select(F.col(user_col).alias("user_id"), epoch_day(ts_col).alias("ed"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("ed")
    tagged = ud.select(
        "user_id",
        "ed",
        F.lag("ed").over(w).alias("_prev"),
        F.lead("ed").over(w).alias("_next"),
    )
    zero = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    own = F.struct(
        F.col("ed").alias("d"),
        F.when(F.col("_prev").isNull(), one).otherwise(zero).alias("new_users"),
        F.when(F.col("_prev") == F.col("ed") - 1, one)
        .otherwise(zero)
        .alias("retained"),
        F.when(
            F.col("_prev").isNotNull() & (F.col("_prev") < F.col("ed") - 1), one
        )
        .otherwise(zero)
        .alias("resurrected"),
        zero.alias("churned"),
    )
    churn_contrib = F.when(
        F.col("_next").isNull() | (F.col("_next") > F.col("ed") + 1),
        F.struct(
            (F.col("ed") + 1).alias("d"),
            zero.alias("new_users"),
            zero.alias("retained"),
            zero.alias("resurrected"),
            one.alias("churned"),
        ),
    )
    contribs = tagged.select(
        F.explode(
            F.filter(F.array(own, churn_contrib), lambda c: c.isNotNull())
        ).alias("c")
    ).select("c.*")
    out = contribs.groupBy("d").agg(
        F.sum("new_users").alias("new_users"),
        F.sum("retained").alias("retained"),
        F.sum("resurrected").alias("resurrected"),
        F.sum("churned").alias("churned"),
    )
    # active days only: a day whose sole contribution is churn has dau 0
    return out.where(
        (F.col("new_users") + F.col("retained") + F.col("resurrected")) > 0
    ).select(
        F.col("d").alias("ed"),
        F.col("new_users").cast("long").alias("new_users"),
        F.col("retained").cast("long").alias("retained"),
        F.col("resurrected").cast("long").alias("resurrected"),
        F.col("churned").cast("long").alias("churned"),
    )
