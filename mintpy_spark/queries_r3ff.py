"""Round-3 batch ff: training-export sequence packing + crawl frontier.

- ``pack_concat_chunks``: GPT-style concat-and-chunk packing of the
  documents corpus into 256-token sequences (pure Catalyst: one window
  cumsum + bounded explode; see operators/packing.py).
- ``pack_next_fit_bins``: document-preserving next-fit packing, the
  applyInPandas fold checked against an exact recursive-CTE oracle.
- ``crawl_frontier_topk``: recrawl scheduling — the north-star's
  page-change-velocity signal (MintPy analog: the velocity ranking in
  timeseries2velocity, `src/mintpy/timeseries2velocity.py`) turned into
  a frontier priority: stale AND frequently-changing series first. All
  integer arithmetic so the ranking is exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.operators.packing import (
    pack_concat_chunks as _pack_cc,
    pack_concat_chunks_oracle_sql,
    pack_next_fit,
    pack_next_fit_oracle_sql,
)
from mintpy_spark.queries import _q, load

_CAP = 256


@_q("pack_concat_chunks", pack_concat_chunks_oracle_sql(_CAP))
def pack_concat_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing stats per (source, chunk): every chunk
    except each source's last must hold exactly 256 tokens."""
    docs = load(spark, sf_dir, "documents")
    return _pack_cc(docs, capacity=_CAP)


@_q("pack_next_fit_bins", pack_next_fit_oracle_sql(_CAP))
def pack_next_fit_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit bin stats per (source, bin): the sequential Arrow fold
    aggregated to (n_docs, tok_fill), hash-checked against the
    recursive-CTE walk."""
    docs = load(spark, sf_dir, "documents")
    packed = pack_next_fit(docs, capacity=_CAP)
    return packed.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").alias("tok_fill"),
    )


@_q(
    "crawl_frontier_topk",
    """
    WITH per AS (
      SELECT user_id, COUNT(*) AS n_obs, MAX(epoch_us(ts)) AS last_us
      FROM events WHERE user_id IS NOT NULL GROUP BY 1
    ), g AS (
      SELECT MAX(last_us) AS gmax FROM per
    )
    SELECT user_id, n_obs,
           (g.gmax - last_us) // 3600000000 AS staleness_h,
           ((g.gmax - last_us) // 3600000000) * n_obs AS priority
    FROM per, g
    ORDER BY priority DESC, user_id
    LIMIT 20
    """,
)
def crawl_frontier_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl frontier: priority = staleness_hours x observation count
    (stale, high-change-velocity series first). One key agg, a broadcast
    1-row corpus-max join, and a TakeOrdered top-k — no global sort."""
    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("last_us"),
    )
    g = per.agg(F.max("last_us").alias("gmax"))
    out = per.crossJoin(F.broadcast(g)).select(
        "user_id",
        "n_obs",
        F.expr("(gmax - last_us) div 3600000000").alias("staleness_h"),
        (
            F.expr("(gmax - last_us) div 3600000000") * F.col("n_obs")
        ).alias("priority"),
    )
    return out.orderBy(F.desc("priority"), F.asc("user_id")).limit(20)
