"""Round-3 additions, batch m: PII scrub audit, token-entropy quality
scoring, and lagged cross-correlation between event streams.

All three are pure-Catalyst column plans (no Python on the data path) and
follow the engine's cross-engine exactness discipline: integer partials
wherever possible, `floor(x*1e6 + 0.5)` micro-quantization for the few
genuinely-float scalars (each computed from identical integer inputs by a
single deterministic IEEE expression on both engines), and the md5-prefix
hash recipe for text fingerprints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.functions.scalars import nonempty_tokens
from mintpy_spark.operators import pii as P
from mintpy_spark.queries import _q, load

# Deterministic PII augmentation: the synthetic documents table contains
# no organic emails/IPs/phones, so the registered query plants one of
# each (phone on every third doc) as a pure function of doc_id — the SAME
# derivation inlined into the oracle SQL, so detection and scrubbing are
# exercised end-to-end with exact parity. In production this column IS
# the raw text.
_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail' || "
    "CAST(doc_id % 7 AS VARCHAR) || '.example.org ip 10.' || "
    "CAST(doc_id % 256 AS VARCHAR) || '.' || "
    "CAST((doc_id * 7) % 256 AS VARCHAR) || '.' || "
    "CAST((doc_id * 13) % 256 AS VARCHAR) || "
    "CASE WHEN doc_id % 3 = 0 THEN ' call +1-555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
)


def _aug_col() -> F.Column:
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        d.cast("string"),
        F.lit("@mail"),
        (d % 7).cast("string"),
        F.lit(".example.org ip 10."),
        (d % 256).cast("string"),
        F.lit("."),
        ((d * 7) % 256).cast("string"),
        F.lit("."),
        ((d * 13) % 256).cast("string"),
        F.when(
            d % 3 == 0,
            F.concat(F.lit(" call +1-555-"), F.lpad((d % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
    )


@_q(
    "text_pii_scrub_stats",
    f"""
    WITH aug AS (
      SELECT source, ({_AUG_SQL}) AS t FROM documents
    ), det AS (
      SELECT source, t,
             {', '.join(P.pii_counts_oracle_exprs('t'))},
             {P.pii_scrub_oracle_expr('t')} AS ts
      FROM aug
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(n_email) AS BIGINT) AS emails,
           CAST(SUM(n_ipv4) AS BIGINT) AS ips,
           CAST(SUM(n_phone) AS BIGINT) AS phones,
           CAST(SUM(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_phone,
           CAST(SUM(len(t) - len(ts)) AS BIGINT) AS scrub_delta,
           bit_xor(('0x' || substring(md5(ts), 1, 15))::BIGINT) AS scrub_fp
    FROM det GROUP BY source
    """,
)
def text_pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction audit per source: match counts per PII class (email /
    IPv4 / phone), documents containing a phone, total characters removed
    by scrubbing, and an order-insensitive fingerprint of the scrubbed
    corpus (bit_xor of per-doc md5-prefix hashes — the value a downstream
    shard-writer would verify against). One scan, zero Python, one
    hash-agg shuffle on `source`; regexes are linear-time class patterns
    evaluated once per row via staged projections."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", _aug_col().alias("t")
    )
    det = P.pii_scrub(P.pii_counts(d, "t"), "t", "ts")
    fp = F.conv(F.substring(F.md5(F.encode(F.col("ts"), "UTF-8")), 1, 15), 16, 10).cast(
        "long"
    )
    return det.groupBy("source").agg(
        F.count("*").alias("docs"),
        F.sum("n_email").alias("emails"),
        F.sum("n_ipv4").alias("ips"),
        F.sum("n_phone").alias("phones"),
        F.sum(F.when(F.col("n_phone") > 0, 1).otherwise(0)).alias("docs_with_phone"),
        F.sum(F.length("t") - F.length("ts")).alias("scrub_delta"),
        F.bit_xor(fp).alias("scrub_fp"),
    )


@_q(
    "text_token_entropy",
    """
    WITH tc AS (
      SELECT doc_id, source, tok, COUNT(*) AS c
      FROM (
        SELECT doc_id, source,
               unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        FROM documents)
      GROUP BY 1, 2, 3
    ), per_doc AS (
      SELECT doc_id, source,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(c * ln(c) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s_q,
             CAST(SUM(c * c) AS BIGINT) AS s_c2
      FROM tc GROUP BY 1, 2
    ), scored AS (
      SELECT source,
             CAST(floor((ln(n) - s_q / (n * 1e6)) * 1e6 + 0.5) AS BIGINT)
               AS entropy_micro,
             CAST(floor((1.0 - CAST(s_c2 AS DOUBLE) / (CAST(n AS DOUBLE) * n)) * 1e6
                        + 0.5) AS BIGINT) AS simpson_micro
      FROM per_doc WHERE n >= 1
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(entropy_micro) AS BIGINT) AS sum_entropy_micro,
           CAST(MIN(entropy_micro) AS BIGINT) AS min_entropy_micro,
           CAST(MAX(entropy_micro) AS BIGINT) AS max_entropy_micro,
           CAST(SUM(simpson_micro) AS BIGINT) AS sum_simpson_micro
    FROM scored GROUP BY source
    """,
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram token entropy per document (the gibberish/boilerplate
    quality signal: low entropy = repetitive text), aggregated per source.

    Cross-engine exactness: the only float steps are `c*ln(c)` on small
    integer counts and one final `ln(n) - s/n` per doc — each immediately
    micro-quantized (floor(x*1e6+0.5)), so every SUM crossing the engines
    is over exact BIGINTs and immune to FP summation order. The Simpson
    concentration (1 - sum(c^2)/n^2) rides along as a fully
    rational second diversity metric. Plan: explode -> two hash aggs
    (partial combine does the heavy lifting) -> source agg."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.explode(nonempty_tokens(F.col("text"))).alias("tok"),
    )
    tc = toks.groupBy("doc_id", "source", "tok").agg(F.count("*").alias("c"))
    tc = tc.withColumn(
        "q", F.floor(F.col("c") * F.log(F.col("c")) * 1e6 + F.lit(0.5)).cast("long")
    )
    per_doc = tc.groupBy("doc_id", "source").agg(
        F.sum("c").alias("n"),
        F.sum("q").alias("s_q"),
        F.sum(F.col("c") * F.col("c")).alias("s_c2"),
    )
    n = F.col("n")
    scored = per_doc.where(n >= 1).select(
        "source",
        F.floor((F.log(n) - F.col("s_q") / (n * 1e6)) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("entropy_micro"),
        F.floor(
            (1.0 - F.col("s_c2").cast("double") / (n.cast("double") * n)) * 1e6
            + F.lit(0.5)
        )
        .cast("long")
        .alias("simpson_micro"),
    )
    return scored.groupBy("source").agg(
        F.count("*").alias("docs"),
        F.sum("entropy_micro").alias("sum_entropy_micro"),
        F.min("entropy_micro").alias("min_entropy_micro"),
        F.max("entropy_micro").alias("max_entropy_micro"),
        F.sum("simpson_micro").alias("sum_simpson_micro"),
    )


@_q(
    "xcorr_daily_lag",
    """
    WITH daily AS (
      SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
             event_type, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1, 2
    ), a AS (SELECT day AS da, cnt AS x FROM daily WHERE event_type = 'click'),
       b AS (SELECT day AS db, cnt AS y FROM daily WHERE event_type = 'purchase'),
    paired AS (
      SELECT lag, x, y
      FROM a CROSS JOIN (SELECT unnest(range(0, 8)) AS lag) lags
      JOIN b ON b.db = a.da + lag
    ), parts AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM paired GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, n, sx, sy, sxx, syy, sxy,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN CAST(floor(
                       CAST(n * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE))
                       * 1e6 + 0.5) AS BIGINT)
                ELSE NULL END AS r_micro
    FROM parts
    """,
)
def xcorr_daily_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between two event streams' daily counts
    (does `click` volume lead `purchase` volume, and by how many days?) —
    the lead/lag diagnostic a metrics pipeline runs between a driver and
    a target series. Pearson r at lags 0..7 from pure integer partials
    (n, sums, sums of squares/products are exact BIGINTs; the single
    float step — one subtract/multiply/sqrt/divide chain of correctly
    rounded IEEE ops on those integers — is micro-quantized), so the
    result is bit-exact across engines and partitionings. Plan: one scan,
    one daily hash-agg, a broadcast 8-row lag table, then an 8-way
    re-keyed agg — all JVM."""
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    daily = (
        ev.withColumn(
            "day", F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        )
        .groupBy("day", "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    a = daily.where(F.col("event_type") == "click").select(
        F.col("day").alias("da"), F.col("cnt").alias("x")
    )
    b = daily.where(F.col("event_type") == "purchase").select(
        F.col("day").alias("db"), F.col("cnt").alias("y")
    )
    lags = spark.range(0, 8).select(F.col("id").alias("lag"))
    paired = a.crossJoin(F.broadcast(lags)).join(
        b, F.col("db") == F.col("da") + F.col("lag")
    )
    parts = paired.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    vx = n * F.col("sxx") - sx * sx
    vy = n * F.col("syy") - sy * sy
    num = (n * F.col("sxy") - sx * sy).cast("double")
    r_micro = (
        F.when(
            (vx > 0) & (vy > 0),
            F.floor(
                num / F.sqrt(vx.cast("double") * vy.cast("double")) * 1e6 + F.lit(0.5)
            ).cast("long"),
        )
    ).alias("r_micro")
    return parts.select(
        F.col("lag").cast("long").alias("lag"),
        "n", "sx", "sy", "sxx", "syy", "sxy", r_micro,
    )
