"""Joint multi-series least-squares decomposition.

Reference analog: ``asc_desc2horz_vert`` (src/mintpy/asc_desc2horz_vert.py:
15 design-matrix G from per-geometry unit vectors, :106 per-pixel
``np.dot(np.linalg.pinv(G), dlos)``): two measurement systems each observe
a different linear combination of two latent components (horizontal /
vertical motion there), and the per-key solve combines them.

Spark recast: every observation row carries its projection coefficients
``(cx, cy)`` (the geometry's unit vector) and a measured value ``d`` with
``d = cx*x + cy*y``. Per key, the 2-parameter least squares

    [x, y] = argmin sum (d - cx*x - cy*y)^2

has the closed-form normal-equation solution (Cramer on the 2x2 system)

    | sxx sxy | |x|   |sxd|          sxx = sum cx^2, sxy = sum cx*cy, ...
    | sxy syy | |y| = |syd|

which is pure partial+final hash aggregation — one shuffle, no Python, and
SQL-expressible for the correctness oracle. Generalizes the reference: it
accepts any number of observations per key per geometry (the reference
stacks exactly one LOS value per geometry per pixel; with exactly two
observations the LS solution interpolates them, reproducing the reference's
``pinv(G) @ dlos``).

Singular keys (all observations share one geometry direction, det ~ 0)
yield NULL components — the analog of the reference masking pixels missing
one geometry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Determinant below this is treated as singular (coefficients are O(1)
# unit-vector entries, so this is a pure degeneracy guard, not a tolerance).
DET_EPS = 1e-12


def joint_decompose(
    obs: DataFrame,
    d_col: str,
    cx_col: str,
    cy_col: str,
    key: str = "url",
    x_name: str = "horz",
    y_name: str = "vert",
) -> DataFrame:
    """Per-key closed-form 2-parameter LS: (key, x, y, num_obs, det).

    ``cx_col``/``cy_col`` are the per-observation projection coefficients
    (e.g. ``sin(inc)*cos(az)`` / ``cos(inc)`` in the reference's LOS
    geometry, asc_desc2horz_vert.py:15-60); ``d_col`` is the measurement.
    """
    cx = F.col(cx_col).cast("double")
    cy = F.col(cy_col).cast("double")
    d = F.col(d_col).cast("double")
    g = (
        obs.where(d.isNotNull())
        .groupBy(key)
        .agg(
            F.sum(cx * cx).alias("sxx"),
            F.sum(cx * cy).alias("sxy"),
            F.sum(cy * cy).alias("syy"),
            F.sum(cx * d).alias("sxd"),
            F.sum(cy * d).alias("syd"),
            F.count(F.lit(1)).alias("num_obs"),
        )
    )
    det = F.col("sxx") * F.col("syy") - F.col("sxy") * F.col("sxy")
    safe_det = F.when(F.abs(det) > DET_EPS, det)  # NULL when singular
    x = (F.col("syy") * F.col("sxd") - F.col("sxy") * F.col("syd")) / safe_det
    y = (F.col("sxx") * F.col("syd") - F.col("sxy") * F.col("sxd")) / safe_det
    return g.select(
        key,
        x.alias(x_name),
        y.alias(y_name),
        "num_obs",
        det.alias("det"),
    )


def decompose_oracle_sql(
    source_sql: str,
    key: str = "url",
    x_name: str = "horz",
    y_name: str = "vert",
    round_dp: int = 4,
) -> str:
    """DuckDB oracle: identical normal-equation arithmetic over
    ``source_sql`` (a subquery producing (key, cx, cy, d))."""
    return f"""
    WITH s AS (
      SELECT {key},
             SUM(cx * cx) AS sxx, SUM(cx * cy) AS sxy, SUM(cy * cy) AS syy,
             SUM(cx * d)  AS sxd, SUM(cy * d)  AS syd,
             COUNT(*)     AS num_obs
      FROM ({source_sql}) WHERE d IS NOT NULL GROUP BY {key}
    )
    SELECT {key},
           ROUND((syy * sxd - sxy * syd)
                 / (CASE WHEN abs(sxx * syy - sxy * sxy) > {DET_EPS}
                         THEN sxx * syy - sxy * sxy END), {round_dp}) AS {x_name},
           ROUND((sxx * syd - sxy * sxd)
                 / (CASE WHEN abs(sxx * syy - sxy * sxy) > {DET_EPS}
                         THEN sxx * syy - sxy * sxy END), {round_dp}) AS {y_name},
           num_obs
    FROM s
    """
