"""Robust winnowing document fingerprints (Schleimer, Wilkerson, Aiken
2003 — the MOSS algorithm): per document, hash every k-token window,
slide a w-window over the hash sequence, and keep each window's minimum
(ties to the RIGHTMOST position). The selected (hash, position) pairs
are the document's fingerprint set — guaranteed to catch any shared
substring of at least k + w - 1 tokens while keeping only ~2/(w+1) of
the k-gram hashes, the density/guarantee trade the paper proves.

Spark shape: the ENTIRE selection is row-local array arithmetic inside
whole-stage codegen — token split, per-window hash, sliding min, and
the distinct-selection all happen in one projection with zero
Exchanges; only the tiny fingerprint rows (doc_id, 40-bit hash, 20-bit
position) ever shuffle. At 10^12 documents the fingerprint table is
~0.4x the k-gram count in rows but each row is 16 bytes, and the pair
join downstream moves only fingerprints, never text.

Determinism: the rightmost-min tie rule is encoded arithmetically —
``combined = hash * 2^20 + (2^20 - 1 - pos)`` — so a plain MIN picks
the smallest hash and, among ties, the largest position; both engines
fold the same integers, no comparator semantics involved. Positions are
bounded by the 2^20 packing (docs longer than ~1M tokens would need a
wider packing; the corpus contract caps docs far below that).

Reference analog: none in MintPy — dedup is a first-class extension of
the build brief; winnowing complements the fixed-k substring census
(operators/dedup.duplicated_window_fraction) with a sub-linear
fingerprint set that still carries positions (clone localization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mintpy_spark.functions.scalars import nonempty_tokens, portable_hash60

# 40-bit window hash + 20-bit position pack into one 60-bit long.
HASH_SPACE = 1 << 40
POS_SPACE = 1 << 20
MAX_POS = POS_SPACE - 1

# One-slot persisted fingerprint cache (plans/cache.py discipline).
_FP_SLOT: list = []


def _kgram_combined(toks: Column, k: int) -> Column:
    """Array of ``hash*2^20 + (MAX_POS - pos)`` per k-gram position —
    the rightmost-min-tie encoding; one element per window start."""
    n_kgrams = F.size(toks) - (k - 1)
    return F.transform(
        F.sequence(F.lit(0), n_kgrams - 1),
        lambda i: (
            F.pmod(
                portable_hash60(F.concat_ws(" ", F.slice(toks, i + 1, k))),
                F.lit(HASH_SPACE),
            )
            * POS_SPACE
            + (F.lit(MAX_POS) - i)
        ),
    )


def _selected_combined(toks: Column, k: int, w: int) -> Column:
    """Distinct winnowed selections as a row-local array of packed
    ``combined`` values: window ends j = w-1 .. n_kgrams-1, selection =
    min of combined over [j-w+1, j] (1-indexed slice start = j-w+2)."""
    combined = _kgram_combined(toks, k)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(w - 1), F.size(combined) - 1),
            lambda j: F.array_min(F.slice(combined, j - (w - 2), w)),
        )
    )


def _guarded_tokens(
    docs: DataFrame, id_col: str, text_col: str, k: int, w: int
) -> DataFrame:
    """(id, _toks) for docs long enough to carry a window, failing
    LOUDLY (assert_true at execution) on any document whose k-gram
    count exceeds the 2^20 position packing — silent position
    wraparound would corrupt fingerprints; a >1M-token document needs
    a wider packing, not a wrong answer."""
    return docs.select(
        F.col(id_col), nonempty_tokens(text_col).alias("_toks")
    ).where(
        (F.size("_toks") >= k + w - 1)
        # coalesce(.., True): NULL text yields NULL size — those rows are
        # dropped by the length filter above, and assert_true(NULL) would
        # throw, so the assert must see True for them regardless of the
        # engine's predicate evaluation order.
        & F.assert_true(
            F.coalesce(
                F.size("_toks") - (k - 1) <= F.lit(POS_SPACE), F.lit(True)
            ),
            F.lit(
                f"winnow: document exceeds {POS_SPACE} k-grams; "
                "positions would wrap the 2^20 packing"
            ),
        ).isNull()
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """(id_col, fp_hash, fp_pos): the distinct winnowed fingerprints of
    each document. Documents with fewer than ``k + w - 1`` tokens carry
    no full window and are omitted (the guarantee threshold — shorter
    matches are invisible to winnowing by construction)."""
    t = _guarded_tokens(docs, id_col, text_col, k, w)
    sel = _selected_combined(F.col("_toks"), k, w)
    fp = t.select(F.col(id_col), F.explode(sel).alias("_fp"))
    return fp.select(
        F.col(id_col),
        # shiftright, NOT `/`: double division loses bits past 2^53 on
        # the 60-bit packed value.
        F.shiftright(F.col("_fp"), 20).alias("fp_hash"),
        (F.lit(MAX_POS) - F.pmod(F.col("_fp"), F.lit(POS_SPACE)))
        .cast("int")
        .alias("fp_pos"),
    )


def winnow_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Per-document fingerprint census: (id, n_kgrams, n_fps,
    density_bp). density_bp = floor(n_fps/n_kgrams*10000 + 0.5) — the
    measured winnowing density against the ~2/(w+1) expectation, integer
    basis points so the value is engine-portable.

    ONE projection, ZERO Exchanges: the selection array is sized
    row-locally (no explode, no re-aggregation, no second scan)."""
    t = _guarded_tokens(docs, id_col, text_col, k, w)
    n_kgrams = (F.size("_toks") - (k - 1)).cast("long")
    n_fps = F.size(_selected_combined(F.col("_toks"), k, w)).cast("long")
    return t.select(
        F.col(id_col),
        n_kgrams.alias("n_kgrams"),
        n_fps.alias("n_fps"),
        F.floor(n_fps * 10000 / n_kgrams + F.lit(0.5))
        .cast("long")
        .alias("density_bp"),
    )


def winnow_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 3,
    df_cap: int = 50,
) -> DataFrame:
    """(id_a, id_b, n_shared): document pairs sharing >= min_shared
    distinct fingerprint HASHES — the MOSS overlap report. Fingerprints
    whose document frequency exceeds ``df_cap`` are dropped before
    pairing (boilerplate guard: a corpus-wide header fingerprint would
    otherwise create a quadratic bucket; standard LSH-bucket-cap
    discipline, the same move operators/dedup.py's banded paths make).
    The join moves only (doc_id, hash) rows clustered by hash — one
    shuffle, bucket fan-out bounded by df_cap^2. The distinct
    fingerprint table is persisted: it feeds the df census AND both
    sides of the pair join (three consumers, one computation)."""
    from mintpy_spark.plans.cache import persist_slot

    f = persist_slot(
        winnow_fingerprints(docs, id_col, text_col, k=k, w=w)
        .select(F.col(id_col), F.col("fp_hash"))
        .distinct(),
        _FP_SLOT,
    )
    ok = f.groupBy("fp_hash").agg(F.count(F.lit(1)).alias("_df")).where(
        (F.col("_df") >= 2) & (F.col("_df") <= df_cap)
    )
    fo = f.join(ok.select("fp_hash"), "fp_hash")
    a = fo.select(F.col("fp_hash"), F.col(id_col).alias("id_a"))
    b = fo.select(F.col("fp_hash"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "fp_hash")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def winnow_oracle_cte(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> str:
    """DuckDB CTE body producing ``sel({id_col}, fp)`` — the INDEPENDENT
    window-function formulation of the same selection (per-position
    rows + MIN OVER a w-row frame + QUALIFY), against the engine's
    shuffle-free array form. Shared by both oracle queries."""
    return f"""
    wt AS (
      SELECT {id_col},
             list_filter(string_split({text_col}, ' '), t -> t <> '') AS toks
      FROM {table}),
    pos AS (
      SELECT {id_col}, unnest([{{'p': i - 1,
          'c': (('0x' || substring(
                   md5(array_to_string(toks[i:i+{k - 1}], ' ')), 1, 15))::BIGINT
                % {HASH_SPACE}) * {POS_SPACE} + ({MAX_POS} - (i - 1))}}
        FOR i IN range(1, len(toks) - {k} + 2)], recursive := true)
      FROM wt WHERE len(toks) >= {k + w - 1}),
    sel AS (
      SELECT DISTINCT {id_col},
        MIN(c) OVER (PARTITION BY {id_col} ORDER BY p
                     ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS fp
      FROM pos QUALIFY p >= {w - 1})
    """
