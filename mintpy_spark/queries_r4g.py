"""Round-4 batch g: Johnson-Lindenstrauss projection distortion audit
(operators/projection.py) — exact-integer JL over md5-derived ±1 signs,
certified against a DuckDB oracle that rebuilds the same projection from
unnested components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mintpy_spark.queries import _q, load

_HEX_POS = "('0','1','2','3','4','5','6','7')"


@_q(
    "embedding_jl_distortion",
    f"""
    WITH q AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) - 1 AS d,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 10000)
                  AS BIGINT) AS qv
      FROM embeddings
    ), s AS (
      SELECT q.vec_id, j.j,
             CAST(SUM(CASE WHEN substring(
                    md5(CAST(j.j AS VARCHAR) || '_' || CAST(q.d AS VARCHAR)),
                    1, 1) IN {_HEX_POS}
                  THEN qv ELSE -qv END) AS BIGINT) AS p
      FROM q CROSS JOIN (SELECT range AS j FROM range(8)) j
      GROUP BY 1, 2
    ), pairs AS (
      SELECT vec_id AS ida, vec_id + 250 AS idb
      FROM embeddings WHERE vec_id < 250
    ), dfull AS (
      SELECT p.ida, CAST(SUM((qa.qv - qb.qv) * (qa.qv - qb.qv)) AS BIGINT)
               AS d2_full
      FROM pairs p
      JOIN q qa ON qa.vec_id = p.ida
      JOIN q qb ON qb.vec_id = p.idb AND qb.d = qa.d
      GROUP BY 1
    ), dproj AS (
      SELECT p.ida, CAST(SUM((sa.p - sb.p) * (sa.p - sb.p)) AS BIGINT)
               AS d2_proj
      FROM pairs p
      JOIN s sa ON sa.vec_id = p.ida
      JOIN s sb ON sb.vec_id = p.idb AND sb.j = sa.j
      GROUP BY 1
    )
    SELECT f.ida AS vec_id, f.d2_full, pr.d2_proj,
           CASE WHEN f.d2_full > 0
                THEN (10000 * pr.d2_proj) // (8 * f.d2_full) END AS ratio_bp
    FROM dfull f JOIN dproj pr ON f.ida = pr.ida
    """,
)
def embedding_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL ±1 projection 64 -> 8 dims with md5-parity signs, audited on
    250 deterministic pairs (id, id+250): exact integer full and
    projected squared distances plus the distortion ratio in basis
    points (JL expectation: 10000). Components quantize to 1e-4 before
    any arithmetic, so both engines sum the same integers in any order.

    Scale: the projection is row-local Catalyst higher-order functions
    (zero shuffle, zero Python); the audit adds one broadcast self-join
    over the bounded pair span. At 10^9 vectors the same projection
    column feeds the IVF/PQ index builders directly.
    """
    from mintpy_spark.operators.projection import jl_distortion_pairs

    emb = load(spark, sf_dir, "embeddings")
    return jl_distortion_pairs(
        emb, "embedding", "vec_id", in_dim=64, out_dim=8, pair_offset=250
    )
