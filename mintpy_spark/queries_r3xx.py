"""Round-3 batch xx: behavioral sequence and value analytics.

* ``session_path_trigrams`` — the top event-type 3-step paths across
  30-minute-gap sessions: the sequence-mining read a product pipeline
  runs on clickstreams. Sessionization is the portable cumulative-sum
  form (gap flag summed over the user's time order) so both engines
  derive identical session ids without a session_window builtin.
* ``ltv_decay_user`` — exponentially decayed lifetime value per user
  (half-life 7 days). The decay weight 2^(-age/7) is decomposed as
  2^(-age DIV 7) * 2^(-(age%7)/7): the integer power is an EXACT
  division by (1 << q), the fractional power is one of seven literal
  double constants inlined identically on both engines — no libm pow
  anywhere, so per-event micro-cents quantize identically and sum
  exactly.
* ``basket_brand_pairs`` — market-basket affinity at brand level: top
  co-occurring brand pairs per order with integer-exact support counts
  and a rounded-bp lift. The pair join runs on the DISTINCT
  (order, brand) table — bounded at 25 brands, so the per-order
  fan-out is =< C(25,2), never line-item quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

_GAP_MIN = 30
_HL = 7
# 2^(-r/7) for r = 0..6 — identical literals on both engines.
_FRAC = (
    "1.0",
    "0.9057236642639067",
    "0.820335356007638",
    "0.7429971445684742",
    "0.6729500963161781",
    "0.6095068271022377",
    "0.5520447568369062",
)
_FRAC_CASE_SQL = "CASE (age % 7) " + " ".join(
    f"WHEN {r} THEN {v}::DOUBLE" for r, v in enumerate(_FRAC)
) + " END"


@_q(
    "session_path_trigrams",
    f"""
    WITH e AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > {_GAP_MIN} * 60 * 1000000
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events WHERE user_id IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM e
    ), tri AS (
      SELECT event_type || '>' ||
             lead(event_type, 1) OVER v || '>' ||
             lead(event_type, 2) OVER v AS path,
             lead(event_type, 2) OVER v AS e3
      FROM s
      WINDOW v AS (PARTITION BY user_id, sid ORDER BY ts, event_id)
    ), c AS (
      SELECT path, COUNT(*) AS cnt FROM tri WHERE e3 IS NOT NULL
      GROUP BY 1
    )
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, path) AS BIGINT)
             AS rnk,
           path, CAST(cnt AS BIGINT) AS cnt
    FROM c
    QUALIFY rnk <= 10
    """,
)
def session_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 within-session event-type trigram paths. One shuffle on
    user_id serves BOTH windows (gap flag + session cumsum + the two
    leads all share the user clustering); the path count is map-side
    combined and the final top-10 is a TakeOrdered over the path
    aggregate. Ties break on the path string."""
    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    new_s = F.when(
        F.lag(us).over(wu).isNull()
        | (us - F.lag(us).over(wu) > _GAP_MIN * 60 * 1000000),
        1,
    ).otherwise(0)
    s = ev.select("user_id", "ts", "event_id", "event_type").withColumn(
        "sid",
        F.sum(new_s).over(
            wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    wv = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    tri = s.select(
        F.concat_ws(
            ">",
            "event_type",
            F.lead("event_type", 1).over(wv),
            F.lead("event_type", 2).over(wv),
        ).alias("path"),
        F.lead("event_type", 2).over(wv).alias("e3"),
    ).where(F.col("e3").isNotNull())
    c = tri.groupBy("path").agg(F.count(F.lit(1)).alias("cnt"))
    top = c.orderBy(F.desc("cnt"), F.asc("path")).limit(10)
    wr = Window.orderBy(F.desc("cnt"), F.asc("path"))
    return top.select(
        F.row_number().over(wr).cast("long").alias("rnk"),
        "path",
        F.col("cnt").cast("long").alias("cnt"),
    )


@_q(
    "ltv_decay_user",
    f"""
    WITH mx AS (
      SELECT MAX(CAST(ts AS DATE)) AS mday FROM events
      WHERE value IS NOT NULL
    ), e AS (
      SELECT user_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             date_diff('day', CAST(ts AS DATE), mx.mday) AS age
      FROM events, mx
      WHERE value IS NOT NULL AND user_id IS NOT NULL
        AND event_type = 'purchase'
    ), wts AS (
      SELECT user_id, cents,
             ({_FRAC_CASE_SQL})
               / CAST(1 << LEAST(age // 7, 62) AS DOUBLE) AS w
      FROM e
    )
    SELECT user_id,
           COUNT(*) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS raw_cents,
           CAST(SUM(CAST(floor(cents * w * 1000000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS decayed_micro
    FROM wts GROUP BY 1
    """,
)
def ltv_decay_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decayed LTV per user: purchase cents weighted by 2^(-age_days/7)
    against the corpus max day. Weight = literal-fraction x exact
    power-of-two division (no libm pow), each event quantized to
    micro-cents BEFORE the per-user sum — exact under any partitioning.
    The max-day scalar is a 1-row broadcast; one scan, one user agg."""
    ev = load(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & (F.col("event_type") == "purchase")
    )
    mx = ev.agg(F.max(F.to_date("ts")).alias("mday"))
    e = ev.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        F.datediff("mday", F.to_date("ts")).alias("age"),
    )
    frac = F.element_at(
        F.array(*[F.lit(float(v)) for v in _FRAC]), F.pmod(F.col("age"), 7) + 1
    )
    w = frac / F.expr(
        "CAST(shiftleft(CAST(1 AS BIGINT),"
        " CAST(LEAST(age DIV 7, 62) AS INT)) AS DOUBLE)"
    )
    wts = e.select("user_id", "cents", w.alias("w"))
    dm = F.floor(F.col("cents") * F.col("w") * 1000000.0 + 0.5).cast("long")
    return wts.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("cents").cast("long").alias("raw_cents"),
        F.sum(dm).cast("long").alias("decayed_micro"),
    )


@_q(
    "basket_brand_pairs",
    """
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), m AS (
      SELECT p_brand, COUNT(*) AS n FROM ob GROUP BY 1
    ), t AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob
    ), pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             COUNT(*) AS support
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2
    ), scored AS (
      SELECT pairs.brand_a, pairs.brand_b,
             CAST(pairs.support AS BIGINT) AS support,
             CAST((20000 * pairs.support * t.n_orders
                   + ma.n * mb.n) // (2 * ma.n * mb.n) AS BIGINT)
               AS lift_bp,
             row_number() OVER (
               ORDER BY (20000 * pairs.support * t.n_orders + ma.n * mb.n)
                        // (2 * ma.n * mb.n) DESC,
                        pairs.brand_a, pairs.brand_b) AS rnk
      FROM pairs
      JOIN m ma ON pairs.brand_a = ma.p_brand
      JOIN m mb ON pairs.brand_b = mb.p_brand
      CROSS JOIN t
      WHERE pairs.support >= 5
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, brand_a, brand_b, support, lift_bp
    FROM scored WHERE rnk <= 10
    """,
)
def basket_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket brand affinity: top-10 brand pairs by lift =
    P(a,b)/(P(a)P(b)), computed as the exact rounded integer division
    (support * n_orders) / (n_a * n_b) in bp. The self-join runs on the
    DISTINCT (order, brand) table — =< 25 rows per order regardless of
    line items, so the pair fan-out is bounded C(25,2) per order and the
    join shuffles once on orderkey. Minimum support 5 keeps noise pairs
    out of the ranking; ranking ties break on the brand pair."""
    from mintpy_spark.plans.cache import persist_slot

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # one-slot persist: four consumers (marginals, total, both join
    # sides) must not each re-scan lineitem — the audited plan showed 5
    # fact scans without it
    ob = persist_slot(
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct(),
        _OB_SLOT,
    )
    m = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n"))
    t = ob.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    a = ob.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand_a"))
    b = ob.select(F.col("l_orderkey").alias("ok2"), F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 5)
    )
    ma = m.select(F.col("p_brand").alias("brand_a"), F.col("n").alias("na"))
    mb = m.select(F.col("p_brand").alias("brand_b"), F.col("n").alias("nb"))
    scored = (
        pairs.join(F.broadcast(ma), "brand_a")
        .join(F.broadcast(mb), "brand_b")
        .crossJoin(F.broadcast(t))
        .withColumn(
            "lift_bp",
            F.expr(
                "(20000 * support * n_orders + na * nb) DIV (2 * na * nb)"
            ).cast("long"),
        )
    )
    wr = Window.orderBy(F.desc("lift_bp"), F.asc("brand_a"), F.asc("brand_b"))
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= 10)
        .select(
            F.col("rnk").cast("long").alias("rnk"),
            "brand_a", "brand_b",
            F.col("support").cast("long").alias("support"),
            "lift_bp",
        )
    )


_OB_SLOT: list = []
