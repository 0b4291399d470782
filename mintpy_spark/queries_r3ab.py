"""Round-3 batch aaa: corpus novelty, classifier confusion, and order
fulfillment latency.

* ``shingle_novelty_share`` — per-doc share of 3-word shingles that
  occur in NO other document: the inverse-dedup signal (novel content
  worth keeping vs corpus-wide boilerplate). df counts run on the
  DISTINCT (doc, shingle) posting list.
* ``langid_confusion_matrix`` — the trigram language classifier
  (functions/langid.py) evaluated against the labeled ``lang`` column:
  per (label, guess) counts + within-label share. The eval harness a
  pipeline runs before trusting a filter model.
* ``olap_ship_latency_quantiles`` — DISCRETE p50/p90/p99 of
  order-to-ship latency days per order priority (value-at-rank, the
  repo's interpolation-free percentile idiom — integer days, no ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mintpy_spark.functions.langid import classify, classify_oracle_sql
from mintpy_spark.queries import _q, load

_TOKS_SQL = "list_filter(string_split(text, ' '), x -> x <> '')"


@_q(
    "shingle_novelty_share",
    f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS sh
      FROM t, unnest(range(1, len(toks) - 1)) AS r(i)
      WHERE len(toks) >= 3
    ), df AS (
      SELECT sh, COUNT(*) AS df FROM sh GROUP BY 1
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST((20000 * SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END)
                 + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS novel_bp
    FROM sh s JOIN df ON s.sh = df.sh
    GROUP BY 1
    """,
)
def shingle_novelty_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc novelty: distinct 3-shingles seen nowhere else, as count
    and rounded bp share. One row-local shingle build (operators/drift.
    shingle_set — the arrays never re-split text per element), one
    distinct posting explode, and the df table joins back on the
    shingle key (vocabulary-sized, Zipf-hot boilerplate shingles are
    agg-side partials). A doc of pure boilerplate scores 0."""
    from mintpy_spark.operators.drift import shingle_set

    d = load(spark, sf_dir, "documents")
    sh = (
        d.select("doc_id", F.explode(shingle_set(F.col("text"), 3)).alias("sh"))
        .distinct()
    )
    df = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    j = sh.join(df, "sh")
    novel = F.when(F.col("df") == 1, 1).otherwise(0)
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.sum(novel).cast("long").alias("n_novel"),
        F.expr(
            "(20000 * SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) + COUNT(*))"
            " DIV (2 * COUNT(*))"
        )
        .cast("long")
        .alias("novel_bp"),
    )


@_q(
    "langid_confusion_matrix",
    f"""
    WITH cls AS ({classify_oracle_sql()}),
    lab AS (
      SELECT d.lang AS label, cls.guess
      FROM documents d JOIN cls ON d.doc_id = cls.doc_id
    ), tot AS (
      SELECT label, COUNT(*) AS n FROM lab GROUP BY 1
    )
    SELECT lab.label, lab.guess,
           COUNT(*) AS cnt,
           CAST((20000 * COUNT(*) + tot.n) // (2 * tot.n) AS BIGINT)
             AS share_bp
    FROM lab JOIN tot ON lab.label = tot.label
    GROUP BY 1, 2, tot.n
    """,
)
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the trigram language classifier against the
    labeled lang column: per (label, guess) count and within-label
    share (rounded integer bp). The diagonal is classifier recall per
    language; off-diagonal mass tells a curation pipeline which language
    pairs need stronger profiles before langid gates ingestion. One
    classify pass (broadcast profile join) + two tiny aggs."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    cls = classify(d)
    lab = d.select("doc_id", F.col("lang").alias("label")).join(
        cls.select("doc_id", "guess"), "doc_id"
    )
    # per-label totals come from the GROUPED matrix via a window (the
    # matrix is ~|langs|^2 rows), not a second aggregation of lab —
    # which would re-execute the whole classify pass (6 scans -> 3).
    g = lab.groupBy("label", "guess").agg(F.count(F.lit(1)).alias("cnt"))
    n = F.sum("cnt").over(Window.partitionBy("label"))
    return g.withColumn("n", n).select(
        "label", "guess", "cnt",
        F.expr("(20000 * cnt + n) DIV (2 * n)").cast("long").alias("share_bp"),
    )


@_q(
    "langid_top_confusions",
    f"""
    WITH cls AS ({classify_oracle_sql()}),
    lab AS (
      SELECT d.lang AS label, cls.guess
      FROM documents d JOIN cls ON d.doc_id = cls.doc_id
    ), m AS (
      SELECT label, guess, COUNT(*) AS cnt,
             SUM(COUNT(*)) OVER (PARTITION BY label) AS n
      FROM lab GROUP BY 1, 2
    ), off AS (
      SELECT label, guess, cnt,
             CAST((20000 * cnt + n) // (2 * n) AS BIGINT) AS share_bp,
             row_number() OVER (ORDER BY cnt DESC, label, guess) AS rank
      FROM m WHERE label <> guess
    )
    SELECT CAST(rank AS BIGINT) AS rank, label, guess, cnt, share_bp
    FROM off WHERE rank <= 3
    """,
)
def langid_top_confusions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most-confused language pairs (off-diagonal confusion mass,
    ties broken by label then guess): the round-over-round regression
    tripwire for the trigram profiles — if a profile edit degrades e.g.
    es-vs-pt separation, the pair climbs this list and the driver hash
    moves. Same one-classify-pass plan as langid_confusion_matrix plus a
    row_number over the ~|langs|^2 off-diagonal matrix (driver-sized)."""
    d = load(spark, sf_dir, "documents")
    cls = classify(d)
    lab = d.select("doc_id", F.col("lang").alias("label")).join(
        cls.select("doc_id", "guess"), "doc_id"
    )
    g = lab.groupBy("label", "guess").agg(F.count(F.lit(1)).alias("cnt"))
    n = F.sum("cnt").over(Window.partitionBy("label"))
    off = (
        g.withColumn("n", n)
        .where(F.col("label") != F.col("guess"))
        .withColumn(
            "share_bp",
            F.expr("(20000 * cnt + n) DIV (2 * n)").cast("long"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), "label", "guess")
            ).cast("long"),
        )
    )
    return off.where(F.col("rank") <= 3).select(
        "rank", "label", "guess", "cnt", "share_bp"
    )


@_q(
    "olap_ship_latency_quantiles",
    """
    WITH lat AS (
      SELECT o.o_orderpriority AS priority,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), r AS (
      SELECT priority, days,
             row_number() OVER (PARTITION BY priority ORDER BY days) AS rk,
             COUNT(*) OVER (PARTITION BY priority) AS n
      FROM lat
    )
    SELECT priority, CAST(MAX(n) AS BIGINT) AS n_items,
           CAST(MAX(CASE WHEN rk = (n - 1) * 50 // 100 + 1 THEN days END)
                AS BIGINT) AS p50_days,
           CAST(MAX(CASE WHEN rk = (n - 1) * 90 // 100 + 1 THEN days END)
                AS BIGINT) AS p90_days,
           CAST(MAX(CASE WHEN rk = (n - 1) * 99 // 100 + 1 THEN days END)
                AS BIGINT) AS p99_days
    FROM r GROUP BY 1
    """,
)
def olap_ship_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency percentiles per priority, DISCRETE
    (value at rank (n-1)*q DIV 100 + 1 — the repo's interpolation-free
    idiom: integer days in, integer days out, no float quantile ulp).
    One fact join (orders dim broadcast at this shape; co-keyed shuffle
    at production), one per-priority rank window, one fold."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", F.col("o_orderpriority").alias("priority")
    )
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "priority", F.datediff("l_shipdate", "o_orderdate").alias("days")
    )
    wp = Window.partitionBy("priority")
    r = lat.select(
        "priority", "days",
        F.row_number().over(wp.orderBy("days")).alias("rk"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )

    def at(q: int):
        return F.max(
            F.when(
                F.col("rk") == F.expr(f"(n - 1) * {q} DIV 100 + 1"),
                F.col("days"),
            )
        ).cast("long")

    return r.groupBy("priority").agg(
        F.max("n").cast("long").alias("n_items"),
        at(50).alias("p50_days"),
        at(90).alias("p90_days"),
        at(99).alias("p99_days"),
    )
