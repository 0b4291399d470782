"""Planted-skew bench (VERDICT r4 #4, north-rule 'skew handled
explicitly' clause): one key carries 10 % of all rows ('hot domain');
measure the three mitigation strategies per workload class on local[32].

Workloads (chosen so each mitigation's real domain shows):
  A. algebraic agg (count/sum/min/max per key) — map-side combine is the
     mitigation Spark already ships; salting should NOT win here.
  B. sort-merge JOIN fact x dim on the skewed key — AQE skew-join split
     vs explicit fact-side salting (dim exploded x SALT) vs nothing.
  C. non-reducible agg (exact count-distinct per key, values ~unique) —
     partial aggregation cannot combine; value-salted two-level agg is
     the only structural fix.

Prints markdown rows for BASELINE.md. Deterministic input via
spark.range + hash mixing; no external data.

Usage: python tools/bench_skew.py [rows_millions]   (default 8)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SALT = 16


def timed(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t = time.time()
        fn()
        best = min(best, time.time() - t)
    return best


def main() -> int:
    mrows = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    hot_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n = int(mrows * 1_000_000)
    hot_mod = max(1, 100 // hot_pct)

    from pyspark.sql import functions as F

    from mintpy_spark.operators.partitioning import salted_agg
    from mintpy_spark.session import get_spark

    spark = get_spark(
        app_name="bench_skew",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.conf

    # 10k keys; key 0 is hot with 10% of rows. value ~unique per row.
    fact = (
        spark.range(0, n)
        .select(
            F.when(F.col("id") % hot_mod == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), 9999) + 1)
            .cast("long")
            .alias("k"),
            (F.pmod(F.xxhash64(F.col("id") + 1), 1 << 32)).alias("v"),
        )
        .repartition(32)
        .cache()
    )
    fact.count()
    dim = (
        spark.range(0, 10_000)
        .select(F.col("id").alias("k"), (F.col("id") * 7 % 100).alias("w"))
        .cache()
    )
    dim.count()

    def set_aqe(enabled: bool, skew: bool):
        sc.set("spark.sql.adaptive.enabled", str(enabled).lower())
        sc.set("spark.sql.adaptive.skewJoin.enabled", str(skew).lower())
        # make the skew splitter willing to act at sandbox sizes
        sc.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        sc.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8MB",
        )
        sc.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")

    rows = []

    # --- A: algebraic agg ---
    set_aqe(True, True)
    a_plain = timed(
        lambda: fact.groupBy("k")
        .agg(F.count("v").alias("cnt"), F.sum("v").alias("vsum"))
        .count()
    )
    a_salted = timed(
        lambda: salted_agg(
            fact, "k", {"cnt": ("count", "v"), "vsum": ("sum", "v")},
            salt=SALT,
        ).count()
    )
    rows.append(("A algebraic agg", a_plain, a_salted, None))

    # --- B: skewed sort-merge join ---
    sc.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ

    def join_plain():
        fact.join(dim, "k").agg(F.sum(F.col("v") * F.col("w"))).collect()

    def join_salted():
        fs = fact.withColumn(
            "_s", F.pmod(F.xxhash64("v"), F.lit(SALT))
        )
        # row-local explode (NOT a cross join — that multiplies the two
        # sides' partition counts into a 1024-task nested-loop stage)
        ds = dim.withColumn(
            "_s", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
        )
        fs.join(ds, ["k", "_s"]).agg(
            F.sum(F.col("v") * F.col("w"))
        ).collect()

    set_aqe(False, False)
    b_noaqe = timed(join_plain)
    set_aqe(True, True)
    b_aqe = timed(join_plain)
    b_salted = timed(join_salted)
    rows.append(("B skewed SMJ join", b_noaqe, b_salted, b_aqe))
    sc.set("spark.sql.autoBroadcastJoinThreshold", "10MB")

    # --- C: non-reducible agg (exact count-distinct) ---
    set_aqe(True, True)
    c_plain = timed(
        lambda: fact.groupBy("k")
        .agg(F.countDistinct("v").alias("nd"))
        .count()
    )

    def cd_salted():
        # shard by hash(value): shards dedup independently, counts add
        fact.withColumn("_s", F.pmod(F.xxhash64("v"), F.lit(SALT))).groupBy(
            "k", "_s"
        ).agg(F.countDistinct("v").alias("nd")).groupBy("k").agg(
            F.sum("nd").alias("nd")
        ).count()

    c_salted = timed(cd_salted)
    rows.append(("C count-distinct", c_plain, c_salted, None))

    # --- D: grouped Python fold (mergeable per-key numpy state) ---
    # the case AQE/map-side combine CANNOT fix: grouped applyInPandas
    # ships the hot key's entire group through one Arrow stream into one
    # Python worker; a mergeable fold (sum of squares — the Welford /
    # sketch-build shape) salts into (key, shard) partials + merge.
    import pandas as pd

    factd = fact if n <= 8_000_000 else fact.where(
        F.pmod(F.xxhash64(F.col("v") + 3), F.lit(max(1, n // 8_000_000))) == 0
    ).cache()
    factd.count()

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["v"].to_numpy(dtype="float64")
        return pd.DataFrame({"k": [pdf["k"].iloc[0]], "ss": [float((v * v).sum())]})

    d_plain = timed(
        lambda: factd.groupBy("k").applyInPandas(fold, "k long, ss double").count(),
        reps=2,
    )

    def d_salt():
        factd.withColumn(
            "_s", F.pmod(F.xxhash64("v"), F.lit(SALT))
        ).groupBy("k", "_s").applyInPandas(
            fold, "k long, ss double"
        ).groupBy("k").agg(F.sum("ss").alias("ss")).count()

    d_salted = timed(d_salt, reps=2)
    rows.append(("D grouped Python fold", d_plain, d_salted, None))

    # --- D': the engine's answer — the seqstate seam, unsalted/salted ---
    from mintpy_spark.operators.seqstate import map_sorted_groups

    def fold_groups(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("k", sort=False)["v"]
        out = (g.apply(lambda s: float((s.to_numpy(dtype="float64") ** 2).sum()))
               .reset_index(name="ss"))
        return out[["k", "ss"]]

    d_seam = timed(
        lambda: map_sorted_groups(
            factd.select("k", "v"), "k", ("v",), fold_groups, "k long, ss double"
        ).count(),
        reps=2,
    )

    def d_seam_salted():
        # shard the hot key, seam over the composite key, merge partials
        # — ONE mapInPandas pass (pandas groupby inside, no per-group
        # Arrow batch), hot key spread across SALT partitions
        fs = factd.withColumn("_s", F.pmod(F.xxhash64("v"), F.lit(SALT)))
        fs = fs.withColumn("ks", F.concat_ws("|", "k", "_s"))

        def fg(pdf: pd.DataFrame) -> pd.DataFrame:
            g = pdf.groupby("ks", sort=False)
            ks = g["k"].first()
            ss = g["v"].apply(
                lambda s: float((s.to_numpy(dtype="float64") ** 2).sum())
            )
            return pd.DataFrame({"k": ks.to_numpy(), "ss": ss.to_numpy()})

        map_sorted_groups(
            fs.select("ks", "k", "v"), "ks", ("v",), fg, "k long, ss double"
        ).groupBy("k").agg(F.sum("ss").alias("ss")).count()

    d_seam_salt = timed(d_seam_salted, reps=2)
    rows.append(("D' seqstate seam fold", d_seam, d_seam_salt, None))

    # parity checks
    p1 = (
        fact.groupBy("k").agg(F.count("v").alias("cnt"), F.sum("v").alias("vsum"))
        .orderBy("k").toPandas()
    )
    p2 = salted_agg(
        fact, "k", {"cnt": ("count", "v"), "vsum": ("sum", "v")}, salt=SALT
    ).orderBy("k").toPandas()
    ok = (p1["cnt"].to_numpy() == p2["cnt"].to_numpy()).all() and (
        p1["vsum"].to_numpy() == p2["vsum"].to_numpy()
    ).all()

    print(
        f"{mrows:g} M rows, 10k keys, hot key = {100 // hot_mod}% of rows; "
        f"salt={SALT}; salted==plain values: {ok}"
    )
    print("| workload | unmitigated | salted | AQE skew-split |")
    print("|---|---|---|---|")
    for name, plain, salted, aqe in rows:
        aqe_s = f"{aqe:.3f}" if aqe is not None else "n/a"
        print(f"| {name} | {plain:.3f} | {salted:.3f} | {aqe_s} |")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
