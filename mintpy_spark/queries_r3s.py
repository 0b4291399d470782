"""Round-3 additions, batch s: Count-Min frequency-sketch tier,
priority (weighted) sampling, and a Zipf rank-frequency slope audit.

The CMS completes the engine's mergeable-sketch family (histogram tier
-> quantiles, KMV tier -> distinct counts, CMS -> point frequencies):
order-independent, loss-free mergeable across tier levels, and
engine-portable via the shared md5 hash, so the whole sketch — not just
its estimates — is oracle-checked bit-for-bit. Priority sampling is the
deterministic weighted-without-replacement scheme a curation pipeline
uses to downsample by quality weight while keeping subset sums unbiased
(Duffield/Lund/Thorup 2007); its priorities use only IEEE
multiply/divide so ranks cannot flip between engines. The Zipf slope is
the classic corpus-health diagnostic (natural text ~ -1).

Reference parity: the CMS is the frequency analog of the reference's
mask-stack counting aggregates (generate_mask.py threshold counts); the
sampler extends §2.11 partitioning/sampling; no direct MintPy analog for
the Zipf fit (text-specific, per the training-data-pipeline brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.functions.scalars import nonempty_tokens
from mintpy_spark.operators.sampling import priority_sample
from mintpy_spark.operators.sketch import cms_estimate, cms_tier
from mintpy_spark.queries import _q, load

# Probe watchlist for the CMS point-frequency query: common synthetic
# vocabulary plus one guaranteed-absent token (its estimate must be an
# exact 0 — the min over rows annihilates on any empty counter).
_CMS_PROBES = ("table", "spark", "hash", "window", "zz_absent")
_CMS_DEPTH, _CMS_WIDTH = 4, 64

_PROBES_SQL = "[" + ", ".join(f"'{t}'" for t in _CMS_PROBES) + "]"


@_q(
    "sketch_cms_token_freq",
    f"""
    WITH toks AS (
      SELECT source,
             unnest(list_filter(string_split(text, ' '), t -> t <> ''))
               AS tok
      FROM documents
    ), sk AS (
      SELECT source, r,
             ('0x' || substring(md5(tok || '|' || CAST(r AS VARCHAR)),
                                1, 15))::BIGINT % {_CMS_WIDTH} AS bucket,
             COUNT(*) AS cnt
      FROM toks CROSS JOIN range({_CMS_DEPTH}) t(r)
      GROUP BY 1, 2, 3
    ), pb AS (
      SELECT s.source, p.token, t.r,
             ('0x' || substring(md5(p.token || '|' || CAST(t.r AS VARCHAR)),
                                1, 15))::BIGINT % {_CMS_WIDTH} AS bucket
      FROM (SELECT DISTINCT source FROM documents) s
      CROSS JOIN (SELECT unnest({_PROBES_SQL}) AS token) p
      CROSS JOIN range({_CMS_DEPTH}) t(r)
    ), est AS (
      SELECT pb.source, pb.token,
             MIN(COALESCE(sk.cnt, 0)) AS est
      FROM pb LEFT JOIN sk USING (source, r, bucket)
      GROUP BY 1, 2
    ), ex AS (
      SELECT source, tok AS token, COUNT(*) AS exact
      FROM toks WHERE tok IN (SELECT unnest({_PROBES_SQL}))
      GROUP BY 1, 2
    )
    SELECT est.source, est.token,
           CAST(est.est AS BIGINT) AS est,
           CAST(COALESCE(ex.exact, 0) AS BIGINT) AS exact
    FROM est LEFT JOIN ex USING (source, token)
    """,
)
def sketch_cms_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Count-Min point-frequency estimates for a fixed probe
    watchlist, alongside the exact counts (est >= exact always; the
    absent probe reports est = exact = 0 here because at this corpus's
    per-source vocabulary some of its 4 width-64 counters stay empty —
    with a saturated sketch the guarantee is only est >= exact).

    Plan: three corpus passes at sandbox layout — the sketch hash-agg
    (map-side combine bounds its Exchange at d*w rows per source), the
    exact-count re-scan (probe-filtered pre-join), and the distinct
    sources scan for the probe frame. The exact branch is this query's
    VERIFICATION tier (same discipline as the dedup twins): production
    at 10^12 tokens runs the sketch agg alone and probes stored
    sketches; distinct sources come from the sketch itself."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(nonempty_tokens(F.col("text"))).alias("tok")
    )
    sk = cms_tier(
        toks, "tok", key_cols=("source",),
        depth=_CMS_DEPTH, width=_CMS_WIDTH,
    )
    probes = (
        docs.select("source").distinct()
        .crossJoin(
            F.broadcast(
                spark.createDataFrame(
                    [(t,) for t in _CMS_PROBES], "token string"
                )
            )
        )
    )
    est = cms_estimate(
        sk, probes, "token", key_cols=("source",),
        depth=_CMS_DEPTH, width=_CMS_WIDTH,
    )
    exact = (
        toks.where(F.col("tok").isin(*_CMS_PROBES))
        .groupBy("source", F.col("tok").alias("token"))
        .agg(F.count(F.lit(1)).cast("long").alias("exact"))
    )
    return est.join(exact, ["source", "token"], "left").select(
        "source",
        "token",
        "est",
        F.coalesce(F.col("exact"), F.lit(0)).cast("long").alias("exact"),
    )


@_q(
    "sample_priority_weighted",
    """
    WITH q AS (
      SELECT source, doc_id, n_chars,
             CAST(n_chars AS DOUBLE) * 1152921504606846976.0
               / CAST((('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                          1, 15))::BIGINT + 1) AS DOUBLE)
               AS qv
      FROM documents
    ), r AS (
      SELECT source, doc_id, n_chars, qv,
             row_number() OVER (PARTITION BY source
                                ORDER BY qv DESC, doc_id ASC) AS rn
      FROM q
    ), t AS (
      SELECT source, MAX(CASE WHEN rn = 6 THEN qv END) AS tau
      FROM r GROUP BY 1
    )
    SELECT r.source, r.doc_id, r.n_chars,
           CAST(r.rn AS INT) AS rank,
           greatest(CAST(r.n_chars AS DOUBLE), COALESCE(t.tau, 0.0))
             AS est_w
    FROM r JOIN t USING (source)
    WHERE r.rn <= 5
    """,
)
def sample_priority_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample (k=5 per source, weight = n_chars)
    via priority sampling, with the Horvitz-Thompson est_w estimator.
    Priorities are hash-derived and use only IEEE multiply/divide, so
    the SAME rows sample in Spark, DuckDB, or any rerun — the
    reproducibility invariant of curation sampling. One window Exchange
    on source.

    est_w is compared UNROUNDED: it contains no summation (w is an
    exact small integer in double; tau a max over exact quotients, and
    max is order-free), so both engines produce bit-identical doubles —
    in-query ROUND would only ADD a half-point divergence channel
    (memory: floor-quantize or don't round at all; never ROUND a
    cross-engine-compared double)."""
    docs = load(spark, sf_dir, "documents")
    out = priority_sample(
        docs, weight_col="n_chars", k=5, id_col="doc_id",
        group_cols=("source",),
    )
    return out.select(
        "source",
        "doc_id",
        "n_chars",
        F.col("rank").cast("int").alias("rank"),
        F.col("est_w"),
    )


@_q(
    "text_zipf_slope",
    """
    WITH cnts AS (
      SELECT source, tok, COUNT(*) AS cnt
      FROM (SELECT source,
                   unnest(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS tok
            FROM documents)
      GROUP BY 1, 2
    ), ranked AS (
      SELECT source, cnt,
             row_number() OVER (PARTITION BY source
                                ORDER BY cnt DESC, tok ASC) AS rnk
      FROM cnts
    ), xy AS (
      SELECT source, ln(CAST(rnk AS DOUBLE)) AS x,
             ln(CAST(cnt AS DOUBLE)) AS y
      FROM ranked WHERE rnk <= 50
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           round((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
                 / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)), 4)
             AS zipf_slope
    FROM xy GROUP BY source
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf rank-frequency slope: OLS of ln(count) on
    ln(rank) over the top-50 tokens (deterministic rank: count desc,
    token asc). Natural language sits near -1; a slope far from it
    flags template spam or vocabulary collapse — a corpus-health gate.
    Plan: token explode -> (source, tok) hash agg -> per-source window
    top-50 -> tiny closed-form agg; two Exchanges, both on source."""
    docs = load(spark, sf_dir, "documents")
    cnts = (
        docs.select(
            "source", F.explode(nonempty_tokens(F.col("text"))).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("cnt").desc(), F.col("tok").asc()
    )
    xy = (
        cnts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 50)
        .select(
            "source",
            F.log(F.col("rnk").cast("double")).alias("x"),
            F.log(F.col("cnt").cast("double")).alias("y"),
        )
    )
    n = F.count(F.lit(1))
    return xy.groupBy("source").agg(
        n.cast("long").alias("n_terms"),
        F.round(
            (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            / (n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")),
            4,
        ).alias("zipf_slope"),
    )
