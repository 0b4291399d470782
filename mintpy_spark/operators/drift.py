"""Inter-snapshot content drift: shingle-set Jaccard between consecutive
documents of a stream.

The engine's north star is page-change velocity; the numeric tiers measure
*how much metric values* change between crawls.  This operator measures how
much the *content itself* changed: for each consecutive pair of documents
in a stream (per-source here; per-url crawl snapshots in production), the
Jaccard similarity of their 3-word shingle sets.  It is the content-level
analog of the reference's pairwise interferogram: MintPy differences
consecutive acquisitions into ifgrams (reference:
src/mintpy/objects/stack.py:688 ifgramStack; sequential-pair network
stack.py:1292-1352) — here the "difference" of two text snapshots is
1 - Jaccard over shingles, the same primitive the dedup family uses
(operators/dedup.py) pointed at the time axis instead of the corpus axis.

Plan shape: one projection builds the distinct-shingle array per document
(whole-stage codegen; the word array is staged once so the shingle lambda
does not re-split the text per element), one window lag per stream brings
the predecessor's array alongside, and the Jaccard is array_intersect /
array-union arithmetic on the two arrays.  A single hash shuffle on the
stream key; shingle arrays never explode into rows, so there is no
token-level shuffle at any scale.  State per row is bounded by document
length, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shingle_set(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a space-tokenized text (empty array for
    texts shorter than n words — guarded explicitly because Spark's
    ``sequence(0, -1)`` yields a descending list, not an empty one).
    Empty tokens are dropped before windowing (the one tokenizer,
    functions/scalars.nonempty_tokens): a run of spaces is a cosmetic
    change, not a shingle boundary, and a whitespace-only doc must yield
    the EMPTY set, not {' '}."""
    from mintpy_spark.functions.scalars import nonempty_tokens

    words = nonempty_tokens(text)
    k = F.size(words) - (n - 1)
    shingles = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", *[F.element_at(words, i + j + 1) for j in range(n)]),
    )
    return F.array_distinct(F.when(k >= 1, shingles).otherwise(F.array()))


def shingle_drift(
    docs: DataFrame,
    text_col: str = "text",
    key: str = "source",
    order_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(key, order_col, inter, union, jaccard) for every document with a
    predecessor in its stream."""
    staged = docs.select(
        key, order_col, shingle_set(F.col(text_col), n).alias("sh")
    )
    w = Window.partitionBy(key).orderBy(order_col)
    with_prev = staged.withColumn("prev", F.lag("sh").over(w)).where(
        F.col("prev").isNotNull()
    )
    inter = F.size(F.array_intersect(F.col("sh"), F.col("prev")))
    union = F.size(F.array_distinct(F.concat(F.col("sh"), F.col("prev"))))
    # zero-union guard (both docs shorter than n words): jaccard is
    # undefined -> NULL in BOTH engines (bare x/0 is NULL in Spark
    # non-ANSI but inf in DuckDB — a cross-engine parity break)
    jac = F.when(
        union > 0, F.round(inter.cast("double") / union, 4)
    )
    return with_prev.select(
        key,
        order_col,
        inter.alias("inter"),
        union.alias("union_sz"),
        jac.alias("jaccard"),
    )


def consecutive_week_bins(
    events: DataFrame,
    bin_col: Column,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(type, pw, bin, cur, prev, tc, tp): for every consecutive week
    pair, the current and previous week's bin counts with week totals —
    the shared scaffolding of the distribution-drift family (TVD, KS).

    Single-pass contribution trick: each (type, week, bin) count feeds
    its own pair (as ``cur``) AND the next week's pair (as ``prev``), so
    ONE histogram agg + one bounded x2 fan-out + one |bins|-partition
    window covers every consecutive-week comparison with no self-join.
    Weeks are epoch-day // 7 (no ISO-week ambiguity).  Rows where either
    side is empty are dropped (a drift score against nothing is
    undefined).  The histogram is one-slot persisted — it feeds both
    contribution sides.
    """
    from pyspark.sql import Window

    from mintpy_spark.plans.cache import persist_slot

    base = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.expr(
            f"CAST(datediff(CAST({ts_col} AS DATE), DATE '1970-01-01')"
            " DIV 7 AS BIGINT)"
        ).alias("wk"),
        bin_col.alias("bin"),
    ).agg(F.count(F.lit(1)).alias("c"))
    base = persist_slot(base, _WEEKBIN_SLOT)
    zero = F.lit(0).cast("long")
    cur_side = base.select(
        "event_type", F.col("wk").alias("pw"), "bin",
        F.col("c").alias("cur"), zero.alias("prev"),
    )
    prev_side = base.select(
        "event_type", (F.col("wk") + 1).alias("pw"), "bin",
        zero.alias("cur"), F.col("c").alias("prev"),
    )
    g = (
        cur_side.unionByName(prev_side)
        .groupBy("event_type", "pw", "bin")
        .agg(F.sum("cur").alias("cur"), F.sum("prev").alias("prev"))
    )
    w = Window.partitionBy("event_type", "pw")
    return g.select(
        "event_type", "pw", "bin", "cur", "prev",
        F.sum("cur").over(w).alias("tc"),
        F.sum("prev").over(w).alias("tp"),
    ).where((F.col("tc") > 0) & (F.col("tp") > 0))


_WEEKBIN_SLOT: list = []


def dense_week_bins(
    events: DataFrame,
    bin_col: Column,
    nbins: int,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """consecutive_week_bins densified to the FULL fixed bin grid
    0..nbins-1: bins absent from both weeks still appear with
    cur=prev=0.  Needed by the drift scores that integrate over the
    whole support — PSI's smoothed log-ratio and Wasserstein-1's
    cumulative sum are non-zero at empty bins (unlike KS's max, which
    is always attained at an occupied bin, or TVD's sum, where empty
    bins contribute 0).  The grid join is (type, week-pair) x nbins —
    a broadcast of a literal nbins-row table against the AGGREGATE, so
    the densification never touches raw rows."""
    t = consecutive_week_bins(events, bin_col, type_col, ts_col)
    pairs = t.groupBy("event_type", "pw").agg(
        F.max("tc").alias("tc"), F.max("tp").alias("tp")
    )
    spark = events.sparkSession
    bins = spark.range(nbins).select(F.col("id").cast("long").alias("bin"))
    grid = pairs.crossJoin(F.broadcast(bins))
    zero = F.lit(0).cast("long")
    return grid.join(
        t.select("event_type", "pw", "bin", "cur", "prev"),
        ["event_type", "pw", "bin"],
        "left",
    ).select(
        "event_type", "pw", "bin",
        F.coalesce("cur", zero).alias("cur"),
        F.coalesce("prev", zero).alias("prev"),
        "tc", "tp",
    )
