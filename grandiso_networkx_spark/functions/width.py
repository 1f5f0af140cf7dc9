"""Shuffle-width control for iterative loops.

An iterative graph pass (HashMin, LPA, star contraction, SCC coloring)
re-executes a fixed-shape join + aggregate over a frame whose size is
known before the loop starts.  Running those rounds at the session-wide
``spark.sql.shuffle.partitions`` (sized for the big scans) pays
per-task dispatch for tasks with microseconds of work on small and
mid-size graphs — measured on local[32] with a 64-partition default:
connected components over 4.1M symmetrized rows runs 12.7s at width 64
vs 5.8s at width 16 (warm), purely from scheduler overhead.

``narrowed_shuffle`` sets the conf to ``ceil(n_rows /
rows_per_partition)`` capped at the session default for the duration of
the loop and restores it on exit — a no-op at cluster scale where
``n_rows >> cap * rows_per_partition``, and the same set/restore
discipline as PageRank's in-loop AQE toggle (operators/pagerank.py).
The conf is session-global while held; operators only wrap their own
loop bodies, never user-visible laziness (every frame returned to the
caller is materialized inside the block or plan-complete).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_SHUFFLE_KEY = "spark.sql.shuffle.partitions"

# One shuffle partition per this many rows of loop state.  Calibrated
# on the narrow-row workloads that use it (see the width sweep in the
# module docstring); PageRank's heavier CSR scatter uses its own 50k
# target via an explicit num_partitions instead.
DEFAULT_ROWS_PER_PARTITION = 250_000


class narrowed_shuffle:
    def __init__(
        self,
        spark: SparkSession,
        n_rows: int,
        rows_per_partition: int = DEFAULT_ROWS_PER_PARTITION,
    ):
        self._spark = spark
        self._default = int(spark.conf.get(_SHUFFLE_KEY, "32"))
        self.width = max(
            1, min(self._default, -(-int(n_rows) // rows_per_partition))
        )

    def __enter__(self) -> "narrowed_shuffle":
        self._spark.conf.set(_SHUFFLE_KEY, str(self.width))
        return self

    def __exit__(self, *exc) -> None:
        self._spark.conf.set(_SHUFFLE_KEY, str(self._default))
