"""Round-3 additions, batch f: STL-lite seasonal decomposition (trend /
seasonal / residual from exact-integer window partials) and unigram
log-probability document scoring (the perplexity-proxy quality filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load

_STL_H = 12
_STL_W = 2 * _STL_H + 1


@_q(
    "stl_decompose_hourly",
    f"""
    WITH q AS (
      SELECT user_id, ts, value,
             CASE WHEN isnan(value) THEN NULL
                  ELSE CAST(floor(value * 100.0 + 0.5) AS BIGINT) END AS v
      FROM events
    ), w AS (
      SELECT user_id, ts, value, v,
             CAST(SUM(v) OVER fr AS BIGINT)   AS tnum,
             CAST(COUNT(v) OVER fr AS BIGINT) AS nwin,
             hour(ts) AS phase
      FROM q
      WINDOW fr AS (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN {_STL_H} PRECEDING AND {_STL_H} FOLLOWING)
    ), full_rows AS (
      SELECT user_id, ts, value, v, tnum, phase,
             v * {_STL_W} - tnum AS d
      FROM w WHERE nwin = {_STL_W} AND v IS NOT NULL
    ), seas AS (
      SELECT user_id, phase,
             CAST(SUM(d) AS BIGINT) AS snum,
             CAST(COUNT(d) AS BIGINT) AS scnt
      FROM full_rows GROUP BY user_id, phase
    )
    SELECT f.user_id, f.ts, f.value,
           floor(CAST(f.tnum AS DOUBLE) / {_STL_W * 100}.0::DOUBLE
                 * 10000.0 + 0.5) / 10000.0 AS trend,
           floor(CAST(s.snum AS DOUBLE)
                 / (CAST(s.scnt AS DOUBLE) * {_STL_W * 100}.0::DOUBLE)
                 * 10000.0 + 0.5) / 10000.0 AS seasonal,
           floor((CAST(f.v AS DOUBLE) / 100.0
                  - CAST(f.tnum AS DOUBLE) / {_STL_W * 100}.0::DOUBLE
                  - CAST(s.snum AS DOUBLE)
                    / (CAST(s.scnt AS DOUBLE) * {_STL_W * 100}.0::DOUBLE))
                 * 10000.0 + 0.5) / 10000.0 AS residual
    FROM full_rows f JOIN seas s
      ON f.user_id = s.user_id AND f.phase = s.phase
    """,
)
def stl_decompose_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite decomposition of each user's value series: ±12-row
    centered moving-average trend, hour-of-day seasonal means of the
    detrended series, residual — all three from exact integer partials
    (operators/seasonal.py; the local nonparametric twin of the global
    timefunc trend+periodic regression)."""
    from mintpy_spark.operators.seasonal import stl_decompose

    ev = load(spark, sf_dir, "events")
    return stl_decompose(
        ev, "value", key="user_id", ts="ts", half_window=_STL_H
    )


@_q(
    "doc_unigram_logprob",
    """
    WITH tok AS (
      SELECT doc_id, t.term
      FROM documents,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t(term)),
    freq AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY term),
    total AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM freq),
    scored AS (
      SELECT tok.doc_id,
             CAST(floor(ln(CAST(freq.c AS DOUBLE) / CAST(total.t AS DOUBLE))
                        * 1000000.0 + 0.5) AS BIGINT) AS lpq
      FROM tok JOIN freq USING (term) CROSS JOIN total)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(lpq) AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE) * 1000000.0), 4) AS logprob
    FROM scored GROUP BY doc_id
    """,
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram log-probability of every document under the corpus's
    own unigram model (operators/tfidf.unigram_logprob) — the
    perplexity-proxy quality filter: rare-token-heavy docs score low.
    Token log-probs are quantized to integer micro-nats before summation
    so the per-doc mean is partitioning- and engine-exact."""
    from mintpy_spark.operators.tfidf import unigram_logprob

    docs = load(spark, sf_dir, "documents")
    return unigram_logprob(docs, text_col="text", id_col="doc_id")
