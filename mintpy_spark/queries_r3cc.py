"""Round-3 additions, batch cc: Bloom join pruning, Wilson confidence
bounds, and RFM segmentation.

* bloom join prune — Spark's runtime-filter technique made explicit and
  ENGINE-PORTABLE: a long-form Bloom filter (row per int64 word, so the
  SQL is width-independent) over the build side's keys, probed by the
  fact side before the exact join.  The query audits what a runtime
  bloom buys: probes passed, exact hits, false positives, prune ratio.
* Wilson bounds — 95 % confidence interval on a daily conversion rate.
  sqrt() is the ONE libm call that IEEE 754 requires to be correctly
  rounded, so it is engine-parity-safe where ln/exp are not; the whole
  formula is ONE shared SQL fragment evaluated verbatim by Spark
  (F.expr) and DuckDB — textual identity, not reimplementation.
* RFM segmentation — the classic recency/frequency/monetary quintile
  cube.  Exact ntile needs a global sort: fine at audit scale and as
  the oracle-checkable form; the production path at 10^9 users swaps
  the ntile for HDR-sketch quantile thresholds (operators/sketch.py),
  which this module's docstrings spell out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

BLOOM_PRUNE_WORDS = 512       # 512 x 63 usable bits = 32 256-bit filter
BLOOM_PRUNE_K = 3
PRICE_CUT = 480000.0

# ONE Wilson fragment, same text on both engines (k, n integer columns).
_Z = "1.959964e0"  # E-notation: parses as DOUBLE in both engines (bare decimals are DECIMAL)
WILSON_LO = (
    f"floor(((k * 1.0e0 / n) + {_Z} * {_Z} / (2 * n)"
    f" - {_Z} * sqrt((k * 1.0e0 / n) * (1 - k * 1.0e0 / n) / n"
    f" + {_Z} * {_Z} / (4.0e0 * n * n)))"
    f" / (1 + {_Z} * {_Z} / n) * 10000 + 0.5e0)"
)
WILSON_HI = (
    f"floor(((k * 1.0e0 / n) + {_Z} * {_Z} / (2 * n)"
    f" + {_Z} * sqrt((k * 1.0e0 / n) * (1 - k * 1.0e0 / n) / n"
    f" + {_Z} * {_Z} / (4.0e0 * n * n)))"
    f" / (1 + {_Z} * {_Z} / n) * 10000 + 0.5e0)"
)


@_q(
    "bloom_join_prune",
    f"""
    WITH members AS (
      SELECT DISTINCT o_orderkey AS key FROM orders
      WHERE o_totalprice > {PRICE_CUT}
    ), mpos AS (
      SELECT key, ('0x' || substring(md5(CAST(key AS VARCHAR) || '|' || t.i),
                   1, 15))::BIGINT % {BLOOM_PRUNE_WORDS * 63} AS p
      FROM members, unnest([0, 1, 2]) AS t(i)
    ), bloom AS (
      SELECT p // 63 AS w, bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
      FROM mpos GROUP BY 1
    ), probes AS (
      SELECT DISTINCT l_returnflag AS flag, l_orderkey AS key FROM lineitem
    ), ppos AS (
      SELECT flag, key,
             ('0x' || substring(md5(CAST(key AS VARCHAR) || '|' || t.i),
              1, 15))::BIGINT % {BLOOM_PRUNE_WORDS * 63} AS p
      FROM probes, unnest([0, 1, 2]) AS t(i)
    ), hit AS (
      SELECT flag, key,
             bool_and(coalesce((b.bits >> CAST(p.p % 63 AS INT)) & 1, 0) = 1)
               AS pass
      FROM ppos p LEFT JOIN bloom b ON b.w = p.p // 63
      GROUP BY 1, 2
    )
    SELECT h.flag AS l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(COUNT(*) FILTER (h.pass) AS BIGINT) AS bloom_pass,
           CAST(COUNT(*) FILTER (m.key IS NOT NULL) AS BIGINT) AS exact_hits,
           CAST(COUNT(*) FILTER (h.pass AND m.key IS NULL) AS BIGINT)
             AS false_pos,
           CAST(floor((1 - COUNT(*) FILTER (h.pass) * 1.0 / COUNT(*))
                      * 10000 + 0.5e0) AS BIGINT) AS prune_bp
    FROM hit h LEFT JOIN members m ON m.key = h.key
    GROUP BY 1
    """,
)
def bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning, audited: build a 32k-bit
    long-form Bloom over high-value orderkeys, probe every distinct
    (returnflag, orderkey) from lineitem, and reconcile against the
    exact semi-join — probes passed, false positives, and the prune
    ratio the filter would buy the scan.  No false negatives by
    construction (every member's bits are OR'd in).  Plan: the filter
    table is <= 512 rows and BROADCAST to the probe side — the fact
    table never shuffles for the prune, which is the point of a runtime
    filter; the exact reconciliation join broadcasts the member list."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    m_bits = BLOOM_PRUNE_WORDS * 63
    members = (
        o.where(F.col("o_totalprice") > PRICE_CUT)
        .select(F.col("o_orderkey").alias("key"))
        .distinct()
    )

    def positions(df: DataFrame) -> DataFrame:
        from mintpy_spark.operators.sketch import portable_hash

        return df.select(
            "*",
            F.explode(
                F.array(
                    *[
                        (
                            portable_hash(
                                F.concat(
                                    F.col("key").cast("string"), F.lit(f"|{i}")
                                )
                            )
                            % m_bits
                        )
                        for i in range(BLOOM_PRUNE_K)
                    ]
                )
            ).alias("p"),
        )

    bloom = (
        positions(members)
        .groupBy(F.expr("p DIV 63").alias("w"))
        .agg(
            F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT)))")
            .alias("bits")
        )
    )
    probes = li.select(
        F.col("l_returnflag").alias("flag"), F.col("l_orderkey").alias("key")
    ).distinct()
    hit = (
        positions(probes)
        .join(F.broadcast(bloom), F.expr("w = p DIV 63"), "left")
        .groupBy("flag", "key")
        .agg(
            F.min(
                F.coalesce(
                    F.expr("(shiftright(bits, CAST(p % 63 AS INT)) & 1) = 1"),
                    F.lit(False),
                )
            ).alias("pass")
        )
    )
    rec = hit.join(
        F.broadcast(members.withColumn("_m", F.lit(1))), "key", "left"
    )
    return rec.groupBy(F.col("flag").alias("l_returnflag")).agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum(F.col("pass").cast("long")).cast("long").alias("bloom_pass"),
        F.sum(F.col("_m").isNotNull().cast("long"))
        .cast("long")
        .alias("exact_hits"),
        F.sum((F.col("pass") & F.col("_m").isNull()).cast("long"))
        .cast("long")
        .alias("false_pos"),
        F.floor(
            (1 - F.sum(F.col("pass").cast("long")) * 1.0 / F.count(F.lit(1)))
            * 10000
            + 0.5
        )
        .cast("long")
        .alias("prune_bp"),
    )


@_q(
    "conversion_rate_wilson",
    f"""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS k
      FROM events GROUP BY 1
    )
    SELECT bucket_start, n, k,
           CAST(floor(k * 10000.0 / n + 0.5) AS BIGINT) AS rate_bp,
           CAST({WILSON_LO} AS BIGINT) AS wilson_lo_bp,
           CAST({WILSON_HI} AS BIGINT) AS wilson_hi_bp
    FROM d
    """,
)
def conversion_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase-rate with Wilson 95 % bounds in basis points — the
    uncertainty-aware conversion metric (the plain ratio overstates
    certainty on thin days).  sqrt is correctly rounded under IEEE 754,
    so the bound is engine-parity-safe; the formula is ONE shared SQL
    string evaluated verbatim by both engines (textual identity, not a
    reimplementation).  Plan: one day agg, then row-local arithmetic."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("bucket_start")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("long")
        .alias("k"),
    )
    return d.select(
        "bucket_start",
        "n",
        "k",
        F.floor(F.col("k") * 10000.0 / F.col("n") + 0.5)
        .cast("long")
        .alias("rate_bp"),
        F.expr(WILSON_LO).cast("long").alias("wilson_lo_bp"),
        F.expr(WILSON_HI).cast("long").alias("wilson_hi_bp"),
    )


@_q(
    "rfm_segments",
    """
    WITH g AS (
      SELECT MAX(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
               AS maxed
      FROM events
    ), u AS (
      SELECT user_id,
             g.maxed - MAX(date_diff('day', DATE '1970-01-01',
                                     CAST(ts AS DATE))) AS rec,
             COUNT(*) AS freq,
             SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS mon
      FROM events, g
      WHERE value IS NOT NULL AND user_id IS NOT NULL
      GROUP BY user_id, g.maxed
    ), s AS (
      SELECT ntile(5) OVER (ORDER BY rec DESC, user_id) AS r,
             ntile(5) OVER (ORDER BY freq, user_id) AS f,
             ntile(5) OVER (ORDER BY mon, user_id) AS m
      FROM u
    )
    SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
           CAST(m AS BIGINT) AS m,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM s GROUP BY 1, 2, 3
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user recency (days since last event, HIGHER
    quintile = more recent), frequency, monetary (integer cents), cut
    into 5x5x5 quintile cells with deterministic user_id tiebreaks.
    The exact ntile is a global sort — correct at audit scale and as
    the oracle-checkable form; at 10^9 users the production path swaps
    quintile edges for HDR-sketch quantiles (operators/sketch.py) and
    assigns cells with a broadcast threshold table, no global sort.
    Plan here: one user agg Exchange, one single-partition window (the
    documented trade), |cells|-bounded final agg."""
    # NULL users excluded on BOTH engines (ntile tiebreak NULL placement
    # differs: Spark NULLS FIRST vs DuckDB NULLS LAST — review finding)
    ev = load(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    maxed = ev.agg(
        F.max(F.datediff(F.to_date("ts"), F.lit("1970-01-01"))).alias("maxed")
    )
    u = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.datediff(F.to_date("ts"), F.lit("1970-01-01"))).alias("_last"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("mon"),
        )
        .crossJoin(F.broadcast(maxed))
        .select(
            "user_id",
            (F.col("maxed") - F.col("_last")).alias("rec"),
            "freq",
            "mon",
        )
    )
    s = u.select(
        F.ntile(5).over(Window.orderBy(F.desc("rec"), F.col("user_id"))).alias("r"),
        F.ntile(5).over(Window.orderBy("freq", "user_id")).alias("f"),
        F.ntile(5).over(Window.orderBy("mon", "user_id")).alias("m"),
    )
    return s.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    ).select(
        F.col("r").cast("long").alias("r"),
        F.col("f").cast("long").alias("f"),
        F.col("m").cast("long").alias("m"),
        "n_users",
    )
