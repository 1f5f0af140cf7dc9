"""Checkpointed iteration state with per-partition lineage metrics.

The north rule requires every iterative pass (motif frontier expansion,
PageRank, components, LPA) to be *resumable from checkpoint with
per-partition lineage + metrics*.  The reference's only analogue is the
``ProfilingQueue`` size-history (``/root/reference/grandiso/queues.py:26-81``);
here each round's state DataFrame is written to Parquet together with a
JSON manifest recording the round number, row/partition counts, and
per-partition row counts (skew visibility — the distributed analogue of
the reference's RAM-bound queue growth, ``README.md:10-12``).

Writing Parquet (rather than ``localCheckpoint``) both truncates the
lineage — without it, round N's plan nests N joins and Catalyst
analysis time grows superlinearly — and makes the state durable: a new
driver can resume from the last completed round.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


class CheckpointManager:
    """Round-indexed Parquet checkpoints + a JSON manifest."""

    def __init__(self, spark: SparkSession, path: str, job: str = "job") -> None:
        self.spark = spark
        self.path = path
        self.job = job
        os.makedirs(path, exist_ok=True)
        self.manifest_path = os.path.join(path, "manifest.json")
        self.manifest = self._load_manifest()

    def _load_manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"job": self.job, "rounds": []}

    def _save_manifest(self) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=1)
        os.replace(tmp, self.manifest_path)

    @property
    def last_round(self) -> int | None:
        rounds = [r["round"] for r in self.manifest["rounds"] if r.get("complete")]
        return max(rounds) if rounds else None

    def round_path(self, rnd: int) -> str:
        return os.path.join(self.path, f"round={rnd:05d}")

    def save(self, rnd: int, df: DataFrame, extra: dict | None = None) -> DataFrame:
        """Write round state, record per-partition metrics, reload.

        Returns the reloaded DataFrame (fresh lineage rooted at the
        Parquet scan).  Metrics come from one pass over the written
        files — no extra job over the live plan.
        """
        t0 = time.time()
        p = self.round_path(rnd)
        if os.path.exists(p):
            shutil.rmtree(p)
        df.write.mode("overwrite").parquet(p)
        reloaded = self.spark.read.parquet(p)
        part_counts = [
            r["n"]
            for r in reloaded.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        rows = sum(part_counts)
        entry = {
            "round": rnd,
            "rows": rows,
            "partitions": len(part_counts),
            "max_partition_rows": max(part_counts) if part_counts else 0,
            "min_partition_rows": min(part_counts) if part_counts else 0,
            "skew_ratio": (
                max(part_counts) * len(part_counts) / rows
                if rows and part_counts
                else 0.0
            ),
            "write_secs": round(time.time() - t0, 3),
            "complete": True,
        }
        if extra:
            entry.update(extra)
        self.manifest["rounds"] = [
            r for r in self.manifest["rounds"] if r["round"] != rnd
        ] + [entry]
        self.manifest["rounds"].sort(key=lambda r: r["round"])
        self._save_manifest()
        return reloaded

    def annotate(self, rnd: int, extra: dict) -> None:
        """Merge convergence metrics (L1 delta, changed-label count, …)
        into an already-saved round's manifest entry — they are only
        known after the state frame is written and aggregated."""
        for r in self.manifest["rounds"]:
            if r["round"] == rnd:
                r.update(extra)
                self._save_manifest()
                return

    def load(self, rnd: int) -> DataFrame:
        return self.spark.read.parquet(self.round_path(rnd))

    def resume(self) -> tuple[int, DataFrame] | None:
        """(last completed round, its state) or None if nothing saved."""
        last = self.last_round
        if last is None:
            return None
        return last, self.load(last)


def flat_checkpoint(df: DataFrame) -> DataFrame:
    """``localCheckpoint`` with Catalyst statistics severed — the
    lineage cut for iterative loops.

    ``Dataset.localCheckpoint`` copies the origin plan's ``Statistics``
    onto the checkpointed ``LogicalRDD`` (``LogicalRDD.fromDataset`` →
    ``rewriteStatsAndConstraints``).  With CBO off (the default), the
    size-only estimator MULTIPLIES child ``sizeInBytes`` at every join,
    so when a loop's round plan joins the state frame against itself or
    against several derived frames, the carried estimate compounds
    round over round as a power tower: measured on the Louvain move
    round (6 joins touching the state), the stored BigInt QUADRUPLES in
    bit-length per round — 63 bits → 8.8k bits by round 3, gigabytes of
    BigInt by round ~10, with each checkpoint spending its time inside
    ``SizeInBytesOnlyStatsPlanVisitor`` multiplying astronomic numbers
    until the driver OOMs.  ``localCheckpoint`` cuts the *execution*
    lineage but deliberately preserves stats; for a convergence loop
    that preservation is the leak.

    Rebuilding the Dataset from the checkpointed ``InternalRow`` RDD
    (``internalCreateDataFrame`` — the same constructor PySpark itself
    uses for Arrow ingestion) drops ``originStats``/``originConstraints``,
    resetting the leaf to an honest size-from-RDD estimate.  No extra
    job runs: the returned frame scans the already-materialized
    checkpoint blocks.  Falls back to the plain checkpoint if the
    internal constructor is unavailable.
    """
    ck = df.localCheckpoint()
    try:
        spark = df.sparkSession
        jdf = ck._jdf
        jrdd = jdf.queryExecution().toRdd()
        jdf2 = spark._jsparkSession.internalCreateDataFrame(
            jrdd, jdf.schema(), False
        )
        return DataFrame(jdf2, spark)
    except Exception:  # pragma: no cover - defensive fallback
        return ck
