"""Round-3 additions, batch r: tier restatement diff (snapshot
time-travel audit), embedding label silhouette (clustering quality from
integer geometry), and time-weighted median (the duration-weighted
continuous-aggregate statistic).

The restatement diff is the audit a continuous-aggregate store runs
after folding late data: which tier buckets changed between the
pre-cutoff snapshot and now, and by how much (pairs with
tier_merge_late / out_of_order_profile; reference analog is the
update-mode recompute decision in the smallbaselineApp driver). The
silhouette is the standard clustering-quality diagnostic for the
embedding table; the time-weighted median extends time_weighted_avg to
the order statistic TimescaleDB-style gauges report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load


@_q(
    "tier_snapshot_diff",
    """
    WITH bounds AS (
      SELECT epoch_us(MIN(ts)) AS lo, epoch_us(MAX(ts)) AS hi FROM events
      WHERE value IS NOT NULL
    ), cutoff AS (
      SELECT CAST(lo + floor((hi - lo) * 9.0 / 10.0) AS BIGINT) AS cut
      FROM bounds
    ), old AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events, cutoff
      WHERE value IS NOT NULL AND epoch_us(ts) <= cutoff.cut
      GROUP BY 1, 2
    ), new AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events
      WHERE value IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT new.day,
           CAST(SUM(CASE WHEN old.user_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS buckets_new,
           CAST(SUM(CASE WHEN old.user_id IS NOT NULL
                         AND (old.cnt <> new.cnt OR old.cents <> new.cents)
                         THEN 1 ELSE 0 END) AS BIGINT) AS buckets_changed,
           CAST(SUM(CASE WHEN old.user_id IS NOT NULL
                         AND old.cnt = new.cnt AND old.cents = new.cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS buckets_unchanged,
           CAST(SUM(new.cnt - COALESCE(old.cnt, 0)) AS BIGINT) AS add_cnt,
           CAST(SUM(new.cents - COALESCE(old.cents, 0)) AS BIGINT)
             AS add_cents
    FROM new LEFT JOIN old USING (user_id, day)
    GROUP BY new.day
    """,
)
def tier_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restatement audit between two tier snapshots: the 1d rollup built
    from events at a cutoff (the last decile boundary of the observed
    time range) vs the rollup over everything — per day, how many
    buckets are new / changed / unchanged and the total count and
    integer-cents deltas. This is the report a continuous-aggregate
    store emits after folding late arrivals (TableStore versions give
    the same diff from STORED snapshots; this query is the from-raw
    oracle form). No bucket ever shrinks (append-only input), so a LEFT
    join from the new snapshot is exact.

    The cutoff derives from integer epoch-µs bounds of the SAME
    NULL-filtered observation set that feeds the tiers (both engines
    filter before the bounds agg, so a NULL-value straggler cannot move
    the cutoff on one side only) with one identical float expression per
    engine (floor((hi-lo)*9.0/10.0)); all compared quantities are
    BIGINTs. Plan: two pruned scans aggregated with
    map-side partials, a partial-sized join on (user, day), one tiny
    day-level agg; the 1-row cutoff table broadcasts."""
    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = ev.agg(
        F.min(us).alias("lo"), F.max(us).alias("hi")
    ).select(
        (
            F.col("lo")
            + F.floor((F.col("hi") - F.col("lo")) * 9.0 / 10.0)
        )
        .cast("long")
        .alias("cut")
    )

    def tier(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "user_id", F.date_trunc("day", F.col("ts")).alias("day")
        ).agg(
            F.count("*").alias("cnt"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            .alias("cents"),
        )

    old = tier(
        ev.crossJoin(F.broadcast(bounds)).where(us <= F.col("cut"))
    ).select(
        "user_id", "day", F.col("cnt").alias("ocnt"), F.col("cents").alias("ocents")
    )
    new = tier(ev)
    j = new.join(old, ["user_id", "day"], "left")
    changed = F.col("ocnt").isNotNull() & (
        (F.col("ocnt") != F.col("cnt")) | (F.col("ocents") != F.col("cents"))
    )
    unchanged = F.col("ocnt").isNotNull() & (
        (F.col("ocnt") == F.col("cnt")) & (F.col("ocents") == F.col("cents"))
    )
    return j.groupBy("day").agg(
        F.sum(F.when(F.col("ocnt").isNull(), 1).otherwise(0)).alias(
            "buckets_new"
        ),
        F.sum(F.when(changed, 1).otherwise(0)).alias("buckets_changed"),
        F.sum(F.when(unchanged, 1).otherwise(0)).alias("buckets_unchanged"),
        F.sum(F.col("cnt") - F.coalesce(F.col("ocnt"), F.lit(0))).alias(
            "add_cnt"
        ),
        F.sum(F.col("cents") - F.coalesce(F.col("ocents"), F.lit(0))).alias(
            "add_cents"
        ),
    )


@_q(
    "embedding_label_silhouette",
    """
    WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 128.0 + 0.5) AS BIGINT)) AS qv
      FROM embeddings
    ), comp AS (
      SELECT label, pos, CAST(SUM(s) AS BIGINT) AS s
      FROM (SELECT label, unnest(qv) AS s,
                   generate_subscripts(qv, 1) AS pos
            FROM q)
      GROUP BY label, pos
    ), cent AS (
      SELECT label, list(s ORDER BY pos) AS cv,
             CAST(SUM(s * s) AS BIGINT) AS qn
      FROM comp GROUP BY label
    ), scored AS (
      SELECT q.vec_id, q.label AS vlabel, cent.label AS clabel,
             CAST(floor(
               CAST(list_sum(list_transform(list_zip(q.qv, cent.cv),
                    z -> z[1] * z[2])) AS DOUBLE)
               / sqrt(CAST(list_sum(list_transform(q.qv, x -> x * x))
                           AS DOUBLE) * CAST(cent.qn AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT) AS cos_q
      FROM q, cent
      WHERE cent.qn > 0
        AND list_sum(list_transform(q.qv, x -> x * x)) > 0
    ), per_vec AS (
      SELECT vec_id, vlabel,
             MAX(CASE WHEN clabel = vlabel THEN cos_q END) AS own_q,
             MAX(CASE WHEN clabel <> vlabel THEN cos_q END) AS other_q
      FROM scored GROUP BY vec_id, vlabel
    )
    SELECT vlabel AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(own_q) AS BIGINT) AS own_cos_q_sum,
           CAST(SUM(other_q) AS BIGINT) AS other_cos_q_sum,
           CAST(SUM(own_q - other_q) AS BIGINT) AS separation_q_sum
    FROM per_vec GROUP BY vlabel
    """,
)
def embedding_label_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-silhouette clustering diagnostic per label: each vector's
    cosine to its own label centroid vs its best cosine to any OTHER
    label centroid, summed per label (micro-quantized so the sums are
    exact integers). The standard 'are the labels actually clusters'
    check run before trusting embedding labels for dedup or sampling.

    Integer geometry end-to-end: vectors scalar-quantize (x128), label
    centroids are INTEGER component sums (cosine is scale-invariant, so
    the un-divided sum vector IS the centroid), and every dot/norm is an
    exact BIGINT; the single float step (qdot / sqrt(qnv x qnS), norms
    multiplied as doubles to stay overflow-safe at corpus scale) is one
    identical IEEE expression per engine, micro-quantized to 1e-6 before
    the per-label sums. Zero vectors and empty centroids are excluded.

    Plan: one posexplode agg builds the 10-row centroid table (64 x N
    partials with map-side combine), which then broadcasts across one
    vector scan — label-count-sized fan-out, no vector-vector pairs."""
    e = load(spark, sf_dir, "embeddings")
    qz = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 128.0 + F.lit(0.5)).cast("long"),
    )
    q = e.select("vec_id", "label", qz.alias("qv"))
    comp = (
        q.select("label", F.posexplode("qv").alias("pos", "s"))
        .groupBy("label", "pos")
        .agg(F.sum("s").alias("s"))
    )
    cent = comp.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s"))), lambda x: x.s
        ).alias("cv"),
        F.sum(F.col("s") * F.col("s")).alias("qn"),
    )
    isum = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    qnv = isum(F.transform(F.col("qv"), lambda x: x * x))
    qdot = isum(F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: a * b))
    cos_q = F.floor(
        qdot.cast("double")
        / F.sqrt(qnv.cast("double") * F.col("qn").cast("double"))
        * 1000000
        + F.lit(0.5)
    ).cast("long")
    scored = (
        q.withColumn("qnv", qnv)
        .where(F.col("qnv") > 0)
        .crossJoin(
            F.broadcast(
                cent.where(F.col("qn") > 0).select(
                    F.col("label").alias("clabel"), "cv", "qn"
                )
            )
        )
        .select(
            "vec_id",
            F.col("label").alias("vlabel"),
            "clabel",
            cos_q.alias("cos_q"),
        )
    )
    per_vec = scored.groupBy("vec_id", "vlabel").agg(
        F.max(
            F.when(F.col("clabel") == F.col("vlabel"), F.col("cos_q"))
        ).alias("own_q"),
        F.max(
            F.when(F.col("clabel") != F.col("vlabel"), F.col("cos_q"))
        ).alias("other_q"),
    )
    return per_vec.groupBy(F.col("vlabel").alias("label")).agg(
        F.count("*").alias("n_vecs"),
        F.sum("own_q").alias("own_cos_q_sum"),
        F.sum("other_q").alias("other_cos_q_sum"),
        F.sum(F.col("own_q") - F.col("other_q")).alias("separation_q_sum"),
    )


@_q(
    "time_weighted_median",
    """
    WITH w AS (
      SELECT event_type, value,
             epoch_us(lead(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id))
             - epoch_us(ts) AS w_us
      FROM events WHERE value IS NOT NULL
    ), c AS (
      SELECT event_type, value, w_us,
             SUM(w_us) OVER (PARTITION BY event_type ORDER BY value)
               AS cumw,
             SUM(w_us) OVER (PARTITION BY event_type) AS totw
      FROM w WHERE w_us IS NOT NULL AND w_us > 0
    )
    SELECT event_type,
           MIN(CASE WHEN 2 * cumw >= totw THEN value END) AS tw_median,
           CAST(MAX(totw) AS BIGINT) AS total_w_us,
           CAST(COUNT(*) AS BIGINT) AS n_segments
    FROM c GROUP BY event_type
    """,
)
def time_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-weighted median per event type: each observation is
    weighted by how long it remained the user's latest value (µs until
    the user's next event), and the median is the smallest value v with
    cumulative weight(<= v) covering half the total — the order-statistic
    companion of time_weighted_avg (TimescaleDB time_weight gauge
    family). Integer µs weights; the cumulative window uses the default
    RANGE frame so tied values share one cumulative sum and the result
    is independent of intra-tie order in both engines. Zero-duration
    segments (same-µs events) and each user's final observation carry no
    weight and are dropped in both spellings.

    Plan: one scan; the lead() window shuffles on user_id, the
    cumulative window re-clusters by event_type (row-level — at corpus
    scale this op downgrades to the histogram-sketch tier,
    operators/rollup.quantile_from_histogram); final agg is tiny."""
    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w = ev.select(
        "event_type",
        "value",
        (F.lead(us, 1).over(wu) - us).alias("w_us"),
    ).where(F.col("w_us").isNotNull() & (F.col("w_us") > 0))
    wt = Window.partitionBy("event_type")
    wc = Window.partitionBy("event_type").orderBy("value")
    c = w.select(
        "event_type",
        "value",
        F.sum("w_us").over(wc).alias("cumw"),
        F.sum("w_us").over(wt).alias("totw"),
    )
    return c.groupBy("event_type").agg(
        F.min(
            F.when(2 * F.col("cumw") >= F.col("totw"), F.col("value"))
        ).alias("tw_median"),
        F.max("totw").alias("total_w_us"),
        F.count("*").alias("n_segments"),
    )
