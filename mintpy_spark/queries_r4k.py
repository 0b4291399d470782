"""Round-4 batch k: the checkpoint/lineage table under the driver
oracle. The north rule requires every stage to write per-partition
lineage + row-count metrics so runs resume mid-tier; resume semantics
are pytest-covered (test_pipeline.py), and this query puts the METRICS
CONTRACT itself under the driver hash — the numbers read back from the
checkpoint table must equal an independent recount of the stage's
per-partition output.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load


@_q(
    "checkpoint_lineage_audit",
    """
    SELECT user_id % 8 AS part_id,
           CAST(COUNT(*) AS BIGINT) AS row_count
    FROM (SELECT DISTINCT user_id, date_trunc('day', ts) FROM events)
    GROUP BY 1
    """,
)
def checkpoint_lineage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run a 1d-cell rollup stage partitioned by hash-mod-8, record one
    lineage row per partition (run_id, stage, part_id, input_fp,
    row_count, status='complete') through CheckpointTable.append's
    atomic temp+rename commit, then answer FROM THE CHECKPOINT TABLE via
    stage_metrics — the oracle independently recounts the per-partition
    1d cells, so a lineage row that under- or over-reports its
    partition flips the driver hash.

    Reference analog: run_or_skip's recorded config attrs + output size
    (utils/utils1.py:691-746) — the recast writes explicit row counts
    instead of trusting file sizes.

    Scale: the stage aggregation is the ordinary tier shuffle; lineage
    adds one bounded collect (one row per partition — 8 here, one per
    Spark partition in production) and a driver-side parquet append, the
    same cost the production export pipeline already pays per stage.
    """
    from mintpy_spark.plans.checkpoint import CheckpointTable

    ev = load(spark, sf_dir, "events")
    cells = (
        ev.select(
            (F.col("user_id") % 8).alias("part_id"),
            "user_id",
            F.date_trunc("day", "ts").alias("d"),
        )
        .distinct()
        .groupBy("part_id")
        .agg(F.count("*").cast("long").alias("row_count"))
    )
    counted = cells.collect()  # bounded: one row per partition
    root = tempfile.mkdtemp(prefix="lineage_audit_")
    ckpt = CheckpointTable(root)
    run_id = uuid.uuid4().hex
    ckpt.append(
        [
            {
                "run_id": run_id,
                "stage": "rollup_1d",
                "part_id": int(r["part_id"]),
                "input_fp": f"events@{sf_dir}",
                "row_count": int(r["row_count"]),
                "wall_ms": 0,
                "status": "complete",
            }
            for r in counted
        ]
    )
    metrics = ckpt.stage_metrics("rollup_1d")
    shutil.rmtree(root, ignore_errors=True)  # metrics are already read
    return spark.createDataFrame(
        sorted(metrics.items()), "part_id long, row_count long"
    )
