"""SparkSession factory tuned for the link-graph engine.

Defaults target a single-box `local[N]` deployment but every knob is the
one you would set on a real multi-executor cluster:

- AQE on (runtime join re-planning, skew-join splitting, partition
  coalescing) — the frontier of a motif search and the rank deltas of
  PageRank change size radically between rounds, so static planning is
  always wrong for at least one round.
- Arrow on — every custom kernel in this engine is a vectorized
  pandas/Arrow UDF (`mapInPandas` / `applyInPandas`); no per-row Python
  anywhere (BASELINE.json `input_hint`).
- `spark.sql.shuffle.partitions` sized from the core count; on a real
  cluster you would size it from (executors × cores × 2-3) and let AQE
  coalesce down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "grandiso-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(max(cpus, 8)))
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Graph workloads are CPU-dense per byte (longs/short strings
        # through joins+aggs): the 64MB default advisory target
        # coalesces a 20M-row gather or frontier join into 1-2 tasks
        # and serializes the stage (measured 2x on the bench graph).
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Deliberately modest heap: with a large heap Spark keeps every
        # persisted/localCheckpointed block as live heap objects and the
        # iterative workloads spend their time in GC scans (measured:
        # the 20M-edge PageRank bench went 166s -> 700s+ just by
        # raising this to 40g).  A small heap spills cold blocks to
        # spark.local.dir (tmpfs here) as serialized bytes instead —
        # the same discipline a real executor with many tasks enforces.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # Local-mode only: shuffle files on tmpfs.  On a real cluster
    # spark.local.dir is the executors' NVMe scratch; in this single-box
    # sandbox the overlay FS serializes 32 concurrent shuffle writers
    # (measured 150s -> 109s on the calibration groupBy).
    shm = "/dev/shm/spark-graft"
    if os.path.isdir("/dev/shm") and "spark.local.dir" not in (extra_conf or {}):
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
