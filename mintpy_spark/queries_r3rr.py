"""Round-3 batch rr: training-mixture curation operators.

* ``sample_temperature_mixture`` — the standard LLM-pretraining source
  reweighting: sample sources proportional to n^alpha (alpha=0.5 here,
  the "temperature" that upweights small high-quality sources) against
  a fixed character budget. All mixture arithmetic is EXACT INTEGER:
  weights are isqrt(chars) (floor(sqrt(x)) of a BIGINT is bit-exact on
  both engines — IEEE sqrt is correctly rounded, and a correctly
  rounded sqrt of a perfect square is the exact root), and every share/
  rate is a rounded integer division ((2*num + den) DIV (2*den)), so no
  float summation order can fork the hash. At true 10^12-doc scale the
  intermediate products need DECIMAL(38,0) instead of BIGINT — noted
  where they occur.
* ``truncation_loss_audit`` — how many characters a context-length cut
  at L in {256, 1024, 4096} would discard per source; the audit you run
  before choosing a packing length (operators/packing.py). Pure integer.
* ``quality_calibration_bins`` — reliability diagram for the stopword-
  ratio fluency heuristic as an English-detector: per integer ratio bin
  (10*n_stop DIV n_tok — division-free binning, no float knife-edge),
  the observed share of docs actually labeled en. Calibrated bins rise
  monotonically; a flat diagram says the score carries no signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load
from mintpy_spark.queries_ext import _STOPWORDS

_ALPHA_NOTE = "alpha = 0.5 via isqrt"
_BUCKETS = 10000


@_q(
    "sample_temperature_mixture",
    f"""
    WITH s AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY 1
    ), w AS (
      SELECT source, n_docs, chars,
             CAST(floor(sqrt(CAST(chars AS DOUBLE))) AS BIGINT) AS wt
      FROM s
    ), t AS (
      SELECT CAST(SUM(wt) AS BIGINT) AS sw,
             CAST(SUM(chars) AS BIGINT) // 2 AS budget
      FROM w
    ), rates AS (
      SELECT w.source, w.n_docs, w.chars, w.wt,
             (20000 * w.wt + t.sw) // (2 * t.sw) AS share_bp,
             LEAST(10000,
                   (20000 * t.budget * w.wt + 2 * t.sw * w.chars - 1)
                     // (2 * t.sw * w.chars)) AS rate_bp
      FROM w, t
    )
    SELECT r.source, r.n_docs, r.chars,
           CAST(r.share_bp AS BIGINT) AS share_bp,
           CAST(r.rate_bp AS BIGINT) AS rate_bp,
           CAST(SUM(CASE WHEN
             ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || ':mix'),
                                1, 15))::BIGINT % {_BUCKETS} < r.rate_bp
             THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM documents d JOIN rates r ON d.source = r.source
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-mixture sampling plan + its realized deterministic
    sample count, per source. Two scans by construction: pass 1 reduces
    documents to a per-source (docs, chars) table (map-side combined);
    the mixture rates are derived on that AGGREGATE (sources are few —
    the 1-row totals cross-join is a broadcast) and broadcast back onto
    pass 2's scan, where the salted md5 bucket (operators/sampling.
    stable_bucket, independent of any split hash) admits each doc with
    probability rate_bp/10000. rate_bp rounds UP (ceil division) so a
    tiny source never rounds to zero admitted docs. BIGINT products here
    overflow past ~10^14 total chars — production uses DECIMAL(38,0)
    for the two marked products."""
    from mintpy_spark.operators.sampling import stable_bucket

    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    w = s.withColumn(
        "wt", F.floor(F.sqrt(F.col("chars").cast("double"))).cast("long")
    )
    t = w.agg(
        F.sum("wt").cast("long").alias("sw"),
        (F.sum("chars").cast("long") / F.lit(2)).cast("long").alias("budget"),
    )
    rates = w.crossJoin(F.broadcast(t)).select(
        "source", "n_docs", "chars",
        # rounded integer division; DECIMAL(38,0) at production scale
        F.expr("(20000 * wt + sw) DIV (2 * sw)").cast("long").alias("share_bp"),
        F.least(
            F.lit(10000),
            F.expr(
                "(20000 * budget * wt + 2 * sw * chars - 1)"
                " DIV (2 * sw * chars)"
            ),
        ).cast("long").alias("rate_bp"),
    )
    admitted = F.when(
        stable_bucket(F.col("doc_id"), _BUCKETS, "mix") < F.col("rate_bp"), 1
    ).otherwise(0)
    return (
        d.select("doc_id", "source")
        .join(F.broadcast(rates), "source")
        .groupBy("source", "n_docs", "chars", "share_bp", "rate_bp")
        .agg(F.sum(admitted).cast("long").alias("n_sampled"))
    )


@_q(
    "truncation_loss_audit",
    """
    SELECT d.source, l.max_len,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN d.n_chars > l.max_len THEN 1 ELSE 0 END)
                AS BIGINT) AS n_truncated,
           CAST(SUM(GREATEST(d.n_chars - l.max_len, 0)) AS BIGINT)
             AS chars_lost,
           CAST((20000 * SUM(GREATEST(d.n_chars - l.max_len, 0))
                 + SUM(d.n_chars)) // (2 * SUM(d.n_chars)) AS BIGINT)
             AS loss_bp
    FROM documents d
    CROSS JOIN (SELECT CAST(UNNEST([256, 1024, 4096]) AS BIGINT) AS max_len) l
    GROUP BY 1, 2
    """,
)
def truncation_loss_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characters lost to a hard context-length cut at 256/1024/4096,
    per source: docs over the limit, total clipped chars, and the loss
    share in rounded basis points of the source's corpus. The threshold
    table is a 3-row literal broadcast against the scan (one pass, x3
    row fan-out BEFORE the agg, map-side combined — never a second
    scan per threshold). Everything is BIGINT arithmetic."""
    d = load(spark, sf_dir, "documents")
    lens = d.sparkSession.createDataFrame(
        [(256,), (1024,), (4096,)], "max_len long"
    )
    j = d.select("source", "n_chars").crossJoin(F.broadcast(lens))
    lost = F.greatest(F.col("n_chars") - F.col("max_len"), F.lit(0))
    return j.groupBy("source", "max_len").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("n_chars") > F.col("max_len"), 1).otherwise(0))
        .cast("long")
        .alias("n_truncated"),
        F.sum(lost).cast("long").alias("chars_lost"),
        F.expr(
            "(20000 * SUM(GREATEST(n_chars - max_len, 0)) + SUM(n_chars))"
            " DIV (2 * SUM(n_chars))"
        )
        .cast("long")
        .alias("loss_bp"),
    )


@_q(
    "quality_calibration_bins",
    f"""
    WITH scored AS (
      SELECT doc_id, lang,
             LEAST(9, (10 * len(list_filter(toks,
                         t -> list_contains({list(_STOPWORDS)!r}, t))))
                       // len(toks)) AS bin
      FROM (
        SELECT doc_id, lang,
               list_filter(string_split(lower(text), ' '), x -> x <> '')
                 AS toks
        FROM documents
      ) WHERE len(toks) > 0
    )
    SELECT bin, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_en,
           CAST((20000 * SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                 + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS en_rate_bp
    FROM scored GROUP BY 1
    """,
)
def quality_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the stopword-ratio score as an en-detector:
    integer bin = min(9, 10*n_stop DIV n_tok) — the binning never forms
    the float ratio, so a doc sitting exactly on a bin edge cannot fork
    between engines — then the observed en share per bin in rounded bp.
    One pass, whole-stage codegen (the stopword array is a broadcast
    literal; same tokenizer as text_stopword_ratio)."""
    d = load(spark, sf_dir, "documents")
    sw = F.array([F.lit(x) for x in _STOPWORDS])
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    t = d.select("doc_id", "lang", toks.alias("toks")).where(F.size("toks") > 0)
    nsw = F.size(F.filter("toks", lambda x: F.array_contains(sw, x)))
    binc = F.least(F.lit(9), F.expr("(10 * nsw) DIV ntok"))
    scored = t.select(
        "lang", nsw.alias("nsw"), F.size("toks").alias("ntok")
    ).select("lang", binc.alias("bin"))
    is_en = F.when(F.col("lang") == "en", 1).otherwise(0)
    return scored.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(is_en).cast("long").alias("n_en"),
        F.expr(
            "(20000 * SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)"
            " + COUNT(*)) DIV (2 * COUNT(*))"
        )
        .cast("long")
        .alias("en_rate_bp"),
    )
