"""Production entrypoint: incremental streaming Kalman smoothing.

The sequential-state sibling of jobs/maintain_job.py: each invocation
folds ONLY the observation files that arrived since the last run through
the streaming Kalman local-level filter (streaming/kalman_stream.py,
applyInPandasWithState; O(1) state per key in the stream state store)
and appends the filtered levels to the output table. Re-running after a
crash is safe: the stream checkpoint replays unconsumed files, the
replay guard (ts <= state watermark) drops redelivered rows, and the
emitted levels are bit-identical to the batch filter over the full
replayed history (tests/test_kalman_stream.py).

Deployment (north_rule):

    cd /root/repo && zip -r /tmp/mintpy_spark.zip mintpy_spark

    spark-submit --master <cluster> \\
        --py-files /tmp/mintpy_spark.zip \\
        jobs/filter_job.py \\
        --input /path/to/obs_parquet \\
        --output /path/to/levels_parquet \\
        --checkpoint /path/to/stream_ckpt \\
        [--q 0.04 --r 1.0]

Reference analog: update-mode incremental processing (smallbaselineApp
run_or_skip) — fold new epochs into carried state, never re-read
history.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def run_filter(
    spark,
    input_path: str,
    output_path: str,
    checkpoint: str,
    schema: str,
    value_col: str,
    key: str,
    ts: str,
    q: float,
    r: float,
) -> None:
    from mintpy_spark.streaming.kalman_stream import streaming_kalman_level

    src = spark.readStream.schema(schema).parquet(input_path)
    qy = (
        streaming_kalman_level(src, value_col, key=key, ts=ts, q=q, r=r)
        .writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    qy.awaitTermination()


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="incremental Kalman smoothing")
    p.add_argument("--input", required=True, help="obs table dir (parquet)")
    p.add_argument("--output", required=True, help="filtered levels dir")
    p.add_argument("--checkpoint", required=True, help="stream checkpoint dir")
    p.add_argument("--value-col", default="text_length")
    p.add_argument("--key", default="url")
    p.add_argument("--ts", default="warc_ts")
    p.add_argument(
        "--schema", default="url string, warc_ts timestamp, text_length long"
    )
    p.add_argument("--q", type=float, default=0.04, help="process variance")
    p.add_argument("--r", type=float, default=1.0, help="observation variance")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from mintpy_spark.session import apply_engine_conf

    # reuse a live session (tests, notebooks) and leave it running; own
    # and stop the session only when this process created it
    owned = SparkSession.getActiveSession() is None
    spark = apply_engine_conf(
        SparkSession.builder.appName("mintpy_spark_filter").getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.time()
    run_filter(
        spark,
        input_path=args.input,
        output_path=args.output,
        checkpoint=args.checkpoint,
        schema=args.schema,
        value_col=args.value_col,
        key=args.key,
        ts=args.ts,
        q=args.q,
        r=args.r,
    )
    import os

    if os.path.isdir(args.output):
        n = spark.read.parquet(args.output).count()
    else:
        n = 0  # no data arrived yet — a successful no-op; any real read
        # error (permissions, corruption) propagates and fails the job
    print(json.dumps({"wall_sec": round(time.time() - t0, 2), "levels": n}))
    if owned:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
