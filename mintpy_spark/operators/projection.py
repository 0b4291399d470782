"""Johnson-Lindenstrauss random projection with exact integer arithmetic.

A training-data pipeline shrinks embedding columns before clustering /
ANN indexing; the JL lemma says a k-dim ±1 projection preserves pairwise
squared distances to (1 ± eps) with k = O(log n / eps^2). This operator
implements the Achlioptas ±1 sign variant with two engine-discipline
twists that make it ORACLE-EXACT (no float summation anywhere):

* components are quantized to integers (floor(x * SCALE)) before any
  arithmetic, so dot products and distances are exact BIGINT sums whose
  order cannot matter;
* the sign matrix is derived from md5("j_d") first-hex-digit parity —
  deterministic, seedless, and reproducible in any engine with md5
  (the same discipline as the bootstrap resampler, queries_r3jj).

Everything is row-local Catalyst higher-order functions (transform /
zip_with / aggregate) — zero shuffle, zero Python, whole-stage codegen.

Reference analog: the reference reduces dimensionality by spatial
multilooking (multilook.py) before estimation; JL projection is the
embedding-space counterpart for the similarity operators
(operators/similarity.py IVF/PQ/LSH family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 10_000  # 1e-4 component quantization keeps worst-case BIGINT safe

_SIGN = (
    "CASE WHEN substring(md5(concat(cast({j} as string), '_',"
    " cast({d} as string))), 1, 1)"
    " IN ('0','1','2','3','4','5','6','7') THEN {v} ELSE -{v} END"
)


def quantize_vec(vec_col: str) -> Column:
    """array<float> -> array<bigint> of floor(x * SCALE) components."""
    return F.expr(
        f"transform({vec_col}, x ->"
        f" cast(floor(cast(x as double) * {SCALE}) as bigint))"
    )


def jl_project(vec_col: str, in_dim: int, out_dim: int) -> Column:
    """array<float> -> array<bigint>: k exact signed sums of the
    quantized components, sign(j, d) = md5 parity."""
    term = _SIGN.format(
        j="j", d="d",
        v=f"cast(floor(cast(x as double) * {SCALE}) as bigint)",
    )
    return F.expr(
        f"transform(sequence(0, {out_dim - 1}), j -> aggregate("
        f" zip_with({vec_col}, sequence(0, {in_dim - 1}), (x, d) -> {term}),"
        f" cast(0 as bigint), (acc, v) -> acc + v))"
    )


def sq_dist(a: str, b: str) -> Column:
    """Exact integer squared L2 distance of two array<bigint> columns."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
        f" cast(0 as bigint), (acc, v) -> acc + v)"
    )


def jl_distortion_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    in_dim: int = 64,
    out_dim: int = 8,
    pair_offset: int = 250,
) -> DataFrame:
    """Distortion audit over deterministic pairs (id, id + pair_offset):
    exact integer full-space and projected squared distances, and the
    JL ratio 10000 * d2_proj / (out_dim * d2_full) in basis points
    (expectation 10000 under the lemma). One broadcast self-join over
    the pair span; all math row-local."""
    q = df.select(
        F.col(id_col).alias("id"),
        quantize_vec(vec_col).alias("q"),
        jl_project(vec_col, in_dim, out_dim).alias("p"),
    )
    a = q.where(F.col("id") < pair_offset).alias("a")
    b = q.select(
        (F.col("id") - pair_offset).alias("id"),
        F.col("q").alias("qb"),
        F.col("p").alias("pb"),
    ).alias("b")
    # compute each distance once, then derive the ratio from the columns
    # (inlining the aggregates into ratio_bp would evaluate both array
    # folds twice per row and let the copies drift apart)
    dists = a.join(b, "id").select(
        F.col("id").alias(id_col),
        sq_dist("q", "qb").alias("d2_full"),
        sq_dist("p", "pb").alias("d2_proj"),
    )
    return dists.select(
        id_col,
        "d2_full",
        "d2_proj",
        F.when(
            F.col("d2_full") > 0,
            F.expr(f"(10000 * d2_proj) div ({out_dim} * d2_full)"),
        ).alias("ratio_bp"),
    )
