"""Max-min fair budget allocation (water-filling) — the crawl-budget
primitive: given per-host demand (page counts) and a global budget B,
fund every host up to a common water level t, never above its demand:

    alloc_i = min(demand_i, t)  with  sum(alloc) == min(B, sum(demand))

The classic progressive-filling solution, computed in CLOSED FORM from
the sorted demand census (no iteration): sort demands ascending, find
the first rank k* whose own level cannot be fully funded —
``prefix_{k*-1} + (n - k* + 1) * d_{k*} > B`` — then

    t = (B - prefix_{k*-1}) div (n - k* + 1)
    r = (B - prefix_{k*-1}) mod (n - k* + 1)

hosts below k* get their full demand; hosts at/after k* get t, with the
r leftover units going one each to the first r of them in (demand, key)
order — fully deterministic integer arithmetic, so Spark and DuckDB
agree bit-for-bit.

Scale shape: the heavy input is the DEMAND CENSUS (one shuffle over the
fact table); the water-level solve then runs on the census, which is
|hosts| rows — orders of magnitude smaller than the corpus. The global
sort window over it is the standard small-table move (same discipline
as the drift/quantile operators); the three scalars (n, B-feasibility,
k* row) ride broadcast 1-row crossJoins, never a driver collect.

Reference analog: none in MintPy — crawl scheduling extends the engine
per the build brief (the frontier-priority op in operators/packing.py
is the per-url companion; this is the cross-host fairness layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def waterfill(
    demand: DataFrame,
    key_col: str,
    demand_col: str,
    budget: int,
) -> DataFrame:
    """(key_col, demand, alloc): max-min fair integer allocation of
    ``budget`` across the demand census. Requires demand >= 0; rows
    with zero demand get zero. sum(alloc) == min(budget, sum(demand)).
    """
    d = demand.select(
        F.col(key_col), F.col(demand_col).cast("long").alias("demand")
    )
    w = Window.orderBy("demand", key_col)
    ranked = d.select(
        key_col,
        "demand",
        F.row_number().over(w).alias("rn"),
        F.sum("demand").over(w).alias("prefix"),
    )
    tot = ranked.agg(
        F.count(F.lit(1)).alias("n"), F.sum("demand").alias("total")
    )
    # first rank whose level can't be fully funded; NULL when the whole
    # demand fits inside the budget (then alloc = demand everywhere).
    kstar = (
        ranked.crossJoin(F.broadcast(tot))
        .where(
            (F.col("prefix") - F.col("demand"))
            + (F.col("n") - F.col("rn") + 1) * F.col("demand")
            > F.lit(budget)
        )
        .agg(F.min("rn").alias("kstar"))
    )
    krow = (
        ranked.crossJoin(F.broadcast(kstar))
        .where(F.col("rn") == F.col("kstar"))
        .select(
            "kstar",
            (F.col("prefix") - F.col("demand")).alias("pfx_before"),
        )
    )
    out = (
        ranked.crossJoin(F.broadcast(tot))
        .join(F.broadcast(krow), F.lit(True), "left")
        .withColumn(
            "_m", F.col("n") - F.col("kstar") + 1  # hosts sharing the level
        )
        .withColumn(
            "_t",
            F.expr(f"({budget} - pfx_before) div _m"),
        )
        .withColumn(
            "_r",
            F.expr(f"({budget} - pfx_before) % _m"),
        )
        .withColumn(
            "alloc",
            F.when(F.col("kstar").isNull(), F.col("demand"))  # budget covers all
            .when(F.col("rn") < F.col("kstar"), F.col("demand"))
            .otherwise(
                F.col("_t")
                + F.when(
                    F.col("rn") < F.col("kstar") + F.col("_r"), F.lit(1)
                ).otherwise(F.lit(0))
            ),
        )
    )
    return out.select(
        key_col, "demand", F.col("alloc").cast("long").alias("alloc")
    )


def waterfill_oracle_sql(
    source_sql: str, key_col: str, budget: int
) -> str:
    """DuckDB twin over ``source_sql`` (must yield ({key_col}, demand)):
    the same closed form via window functions + scalar subqueries."""
    return f"""
    WITH d AS ({source_sql}),
    ranked AS (
      SELECT {key_col}, demand,
             ROW_NUMBER() OVER (ORDER BY demand, {key_col}) AS rn,
             SUM(demand) OVER (ORDER BY demand, {key_col}
                               ROWS UNBOUNDED PRECEDING) AS prefix
      FROM d),
    tot AS (SELECT COUNT(*) AS n FROM ranked),
    ks AS (
      SELECT MIN(rn) AS kstar
      FROM ranked, tot
      WHERE (prefix - demand) + (n - rn + 1) * demand > {budget}),
    krow AS (
      SELECT ks.kstar, r.prefix - r.demand AS pfx_before
      FROM ks JOIN ranked r ON r.rn = ks.kstar)
    SELECT ranked.{key_col},
           CAST(ranked.demand AS BIGINT) AS demand,
           CAST(CASE
             WHEN krow.kstar IS NULL THEN ranked.demand
             WHEN ranked.rn < krow.kstar THEN ranked.demand
             ELSE ({budget} - krow.pfx_before)
                    // (tot.n - krow.kstar + 1)
                  + CASE WHEN ranked.rn < krow.kstar
                              + (({budget} - krow.pfx_before)
                                 % (tot.n - krow.kstar + 1))
                         THEN 1 ELSE 0 END
           END AS BIGINT) AS alloc
    FROM ranked
    CROSS JOIN tot
    LEFT JOIN krow ON TRUE
    """
