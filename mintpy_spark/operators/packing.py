"""Sequence packing: assemble documents into fixed-token-budget training
examples.

No MintPy analog — this is a first-class training-data-pipeline operator
(like curation.py / sampling.py): a pretraining exporter must turn a
corpus of variable-length documents into fixed-capacity sequences. Two
standard disciplines are implemented:

- ``pack_concat_chunks``: concatenate documents in a deterministic order
  inside each group and slice the token stream every ``capacity`` tokens
  (documents may straddle a boundary). This is the classic GPT-style
  pretraining layout — zero padding, every chunk except the group's last
  is exactly full. It is a PURE Catalyst plan: one window cumsum per
  group plus a bounded explode (a document spans at most
  ``tok // capacity + 2`` chunks), so it scales to 10^12 documents with
  a single shuffle on the group key.
- ``pack_next_fit``: document-preserving next-fit packing (no document
  is split; a new bin starts whenever the running fill would overflow).
  Inherently sequential inside a group, so it runs as one Arrow-batched
  ``applyInPandas`` fold per group — parallel across groups, which is
  the production sharding anyway (pack within a shard, never across).

Token counting is a single-space split (``split(text, ' ')``), chosen
because it is byte-identical across Spark, DuckDB (``string_split``) and
Python ``str.split(' ')`` — empty strings from consecutive/trailing
separators are kept by all three, so the counts (and therefore the chunk
boundaries) are verifiable row-for-row in any engine.

All chunk arithmetic is INTEGER (``div`` / ``//``), never double
division: token offsets at 10^12-document scale exceed 2^53 and would
silently lose precision in a float floor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def token_count(text_col: str | Column) -> Column:
    """Single-space-split token count (cross-engine parity; see module
    docstring). NULL text counts 0 tokens."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.coalesce(F.size(F.split(c, " ")), F.lit(0)).cast("long")


def pack_concat_chunks(
    docs: DataFrame,
    capacity: int = 256,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk packing stats: one row per (group, chunk_id) with
    ``n_docs`` (documents contributing tokens to the chunk), ``n_starts``
    (documents beginning in it) and ``tok_fill`` (always == capacity
    except each group's final chunk).

    Plan: window cumsum over (group, id) -> bounded explode of the chunk
    range each document spans -> hash agg on (group, chunk_id). One
    Exchange on the group key; the explode fans out at most
    ``tok div capacity + 2`` rows per document.
    """
    assert capacity > 0
    cap = F.lit(int(capacity))
    w = Window.partitionBy(group_col).orderBy(id_col)
    d = (
        docs.select(group_col, id_col, token_count(text_col).alias("tok"))
        .withColumn("cum_end", F.sum("tok").over(w))
        .withColumn("cum_start", (F.col("cum_end") - F.col("tok")))
        .where(F.col("tok") > 0)  # zero-token docs span no chunk (and an
        # empty span would build a DESCENDING sequence — see memory note)
    )
    spans = d.withColumn(
        "chunk_id",
        F.explode(
            F.sequence(
                F.expr(f"cum_start div {int(capacity)}"),
                F.expr(f"(cum_end - 1) div {int(capacity)}"),
            )
        ),
    )
    lo = F.col("chunk_id") * cap
    hi = lo + cap
    return spans.groupBy(group_col, "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("cum_start") >= lo).cast("long")).alias("n_starts"),
        F.sum(
            F.least(F.col("cum_end"), hi) - F.greatest(F.col("cum_start"), lo)
        ).alias("tok_fill"),
    )


def pack_concat_chunks_oracle_sql(
    capacity: int = 256, table: str = "documents",
    group_col: str = "source", id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """Exact DuckDB formulation of pack_concat_chunks (integer division
    via ``//``; SUMs cast to BIGINT — DuckDB sums ints into HUGEINT)."""
    return f"""
    WITH d AS MATERIALIZED (
      SELECT {group_col}, {id_col},
             len(string_split({text_col}, ' ')) AS tok,
             CAST(SUM(len(string_split({text_col}, ' '))) OVER
               (PARTITION BY {group_col} ORDER BY {id_col}
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end
      FROM {table}
    ), s AS (
      SELECT {group_col}, tok, cum_end, cum_end - tok AS cum_start
      FROM d WHERE tok > 0
    ), spans AS (
      SELECT {group_col}, tok, cum_start, cum_end,
             unnest(generate_series(cum_start // {capacity},
                                    (cum_end - 1) // {capacity})) AS chunk_id
      FROM s
    )
    SELECT {group_col}, chunk_id,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN cum_start >= chunk_id * {capacity}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
           CAST(SUM(LEAST(cum_end, (chunk_id + 1) * {capacity})
                    - GREATEST(cum_start, chunk_id * {capacity}))
                AS BIGINT) AS tok_fill
    FROM spans GROUP BY 1, 2
    """


def pack_next_fit(
    docs: DataFrame,
    capacity: int = 256,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document-preserving next-fit packing: per-document bin assignment
    (group, doc_id, tok, bin_id), bins numbered from 1 in id order inside
    each group. A new bin opens whenever ``fill + tok > capacity``; a
    document larger than the capacity therefore gets a bin of its own.

    The fold is sequential by construction, so it runs as ONE
    applyInPandas pass per group — the group arrives as a single pandas
    frame (unlike mapInPandas chunking), sorted here before folding.
    """
    assert capacity > 0
    cap = int(capacity)

    def fold(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        toks = [
            len(t.split(" ")) if isinstance(t, str) else 0
            for t in pdf[text_col]
        ]
        bins, bin_id, fill = [], 0, cap + 1  # force-open bin 1 on row 0
        for tok in toks:
            if fill + tok > cap:
                bin_id += 1
                fill = tok
            else:
                fill += tok
            bins.append(bin_id)
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                id_col: pdf[id_col],
                "tok": pd.Series(toks, dtype="int64"),
                "bin_id": pd.Series(bins, dtype="int64"),
            }
        )

    out_schema = f"{group_col} string, {id_col} long, tok long, bin_id long"
    return (
        docs.select(group_col, id_col, text_col)
        .groupBy(group_col)
        .applyInPandas(fold, out_schema)
    )


def pack_next_fit_oracle_sql(
    capacity: int = 256, table: str = "documents",
    group_col: str = "source", id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """Recursive-CTE next-fit walk (one step per in-group row index, all
    groups advance together) aggregated to per-bin stats. The doc table
    is MATERIALIZED — DuckDB inlines CTEs, and the walk references it
    every iteration."""
    return f"""
    WITH RECURSIVE d AS MATERIALIZED (
      SELECT {group_col}, {id_col},
             len(string_split({text_col}, ' ')) AS tok,
             row_number() OVER (PARTITION BY {group_col}
                                ORDER BY {id_col}) AS rn
      FROM {table}
    ), walk AS (
      SELECT {group_col}, rn, tok, 1 AS bin_id, tok AS fill
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.{group_col}, d.rn, d.tok,
             CASE WHEN w.fill + d.tok > {capacity}
                  THEN w.bin_id + 1 ELSE w.bin_id END,
             CASE WHEN w.fill + d.tok > {capacity}
                  THEN d.tok ELSE w.fill + d.tok END
      FROM walk w JOIN d
        ON d.{group_col} = w.{group_col} AND d.rn = w.rn + 1
    )
    SELECT {group_col}, bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS tok_fill
    FROM walk GROUP BY 1, 2
    """
