"""One-off scaling probe for the Python/Arrow path: the SBAS network
inversion (pair generation -> structure-cohort batched applyInPandas LS
solve) at local[N] vs local[4N], interleaved fresh-session reps with the
min estimator — the same protocol as bench.py's rollup scaling leg, but
exercising the engine's heaviest NON-JVM stage. Evidence for BASELINE.md
that the Arrow/pandas solve scales like the Catalyst paths, not like the
reference's re-read-everything Dask workers.

Two modes, because the cohort batching CHANGES the bottleneck class:

- ``cohort`` (default): the production path. One Laplacian factorization
  per structure cohort + multi-RHS solve amortizes the numpy compute to
  near zero, so on ONE box the stage is bound by shuffle + Arrow
  data movement (memory bandwidth), which saturates below 8 cores —
  cores beyond that don't help (measured: ~flat local[8] vs local[32]).
  On a real multi-executor cluster each executor brings its own memory
  bandwidth, so this leg's scaling unit is executors, not cores.
- ``perkey``: the per-key pinv path (sigma propagation), the same
  math shape as the reference's per-pixel estimate_timeseries_cov —
  compute-bound, demonstrates the core-scaling of the Python solve
  itself once data movement is not the ceiling.

Usage: python tools/bench_inversion_scaling.py [URLS [OBS [REPS [MODE]]]]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

URLS = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
OBS = int(sys.argv[2]) if len(sys.argv) > 2 else 60
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
MODE = sys.argv[4] if len(sys.argv) > 4 else "cohort"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_SMALL = max(CPUS // 4, 1)


def run_once(cores: int, staged_path: str) -> float:
    from pyspark.sql import functions as F

    from mintpy_spark.operators.diff import pair_deltas
    from mintpy_spark.operators.invert import network_invert
    from mintpy_spark.session import get_spark

    os.environ.setdefault("MINTPY_SPARK_DRIVER_MEM", "48g")
    spark = get_spark(
        app_name=f"inv_scale_{cores}", master=f"local[{cores}]",
        shuffle_partitions=128,
    )
    spark.sparkContext.setLogLevel("ERROR")
    obs = spark.read.parquet(staged_path)
    t0 = time.time()
    pairs = pair_deltas(obs, "text_length", max_lag=2, key="url", ts="warc_ts")
    if MODE == "perkey":
        # sigma triggers the one-group-per-key pinv path — the
        # reference's per-pixel covariance math, compute-bound.
        pairs = pairs.withColumn("sigma", F.lit(1.0))
        out = network_invert(
            pairs, key="url", ts1="ts1", ts2="ts2", sigma_col="sigma"
        )
    else:
        out = network_invert(
            pairs, key="url", ts1="ts1", ts2="ts2", num_buckets=256
        )
    n = out.agg(F.count("*")).collect()[0][0]
    dt = time.time() - t0
    spark.stop()
    assert n > 0
    return dt


def main() -> None:
    from mintpy_spark.datagen import gen_pages_bulk
    from mintpy_spark.operators.observe import pages_to_obs_extracted
    from mintpy_spark.session import get_spark

    staged = "/dev/shm/inv_scale_obs.parquet" if os.path.isdir("/dev/shm") \
        else "/tmp/inv_scale_obs.parquet"
    os.environ.setdefault("MINTPY_SPARK_DRIVER_MEM", "48g")
    spark = get_spark(app_name="inv_scale_gen", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    pages = gen_pages_bulk(spark, num_urls=URLS, obs_per_url=OBS)
    pages_to_obs_extracted(pages).select("url", "warc_ts", "text_length") \
        .write.mode("overwrite").parquet(staged)
    spark.stop()

    times = {N_SMALL: [], CPUS: []}
    for _ in range(REPS):
        for cores in (N_SMALL, CPUS):  # interleaved
            times[cores].append(run_once(cores, staged))
    obs_total = URLS * OBS
    tn, t4 = min(times[N_SMALL]), min(times[CPUS])
    # Use the ACTUAL core ratio, not a hardcoded 4: with CPUS < 4,
    # N_SMALL clamps to 1 and the ratio is CPUS, not 4 (ADVICE r3).
    core_ratio = CPUS / N_SMALL
    eff = (obs_total / t4) / (core_ratio * (obs_total / tn))
    print(json.dumps({
        "job": f"pair_deltas(max_lag=2) -> network_invert ({MODE})",
        "obs": obs_total, "urls": URLS,
        "cores_n": N_SMALL, "cores_4n": CPUS,
        "sec_n": round(tn, 2), "sec_4n": round(t4, 2),
        "sec_n_samples": [round(x, 2) for x in sorted(times[N_SMALL])],
        "sec_4n_samples": [round(x, 2) for x in sorted(times[CPUS])],
        "obs_per_sec_4n": round(obs_total / t4, 1),
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
