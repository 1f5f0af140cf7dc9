"""Distributed PageRank as sparse gather-scatter over CSR-style
adjacency blocks (north-rule op — not in the reference; SURVEY.md §2.6).

Semantics match ``networkx.pagerank`` exactly (power iteration with
damping ``alpha``, uniform teleport/dangling distribution, L1
convergence test ``err < N * tol`` — so per-vertex scores are
``allclose 1e-6`` against the oracle at convergence).

Scale design
------------
- **Adjacency prep (once):** out-strength per source, then edges are
  grouped into *salted chunks* — ``chunk = hash(src, dst) %
  ceil(out_deg / chunk_size)`` — before ``collect_list``.  A hub vertex
  with 10^8 out-edges never produces one giant array row or one
  overloaded reducer: its adjacency is spread across ~deg/chunk_size
  hash-balanced rows.  This is the salted repartitioning the north rule
  mandates for hub skew.  Blocks are then hash-partitioned by ``src``
  and persisted, so the per-iteration ranks⋈blocks join re-shuffles
  NEITHER side (ranks come out of the previous round partitioned by
  id ≡ src).
- **Scatter kernels** (measured at 2M edges, local[8]):
  ``jvm`` (default) — ``explode(arrays_zip(dsts, ws))`` inside
  whole-stage codegen, 2.8 s/iter; ``arrow`` — zero-copy
  ``mapInArrow`` CSR kernel (flatten list buffers + ``np.repeat``),
  the mandated pandas/Arrow SpMV formulation; the old pandas-object
  path measured 13.6 s/iter and was dropped.  Both are vectorized —
  no per-row Python anywhere.
- **Gather:** ``groupBy(dst).sum`` with map-side partial aggregation
  (hub in-degree combines locally before the exchange).
- **State:** the ranks DataFrame is the only iteration state; each
  round is checkpointed (lineage truncation + resumability + per-
  partition metrics) via :class:`~grandiso_networkx_spark.checkpoint.
  CheckpointManager` or ``localCheckpoint``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from ..checkpoint import CheckpointManager

SCATTER_SCHEMA = "dst string, contrib double"


def _scatter_arrow(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
    """Zero-copy CSR scatter: per Arrow batch, flatten the dst list
    column and repeat rank/out_w along the list offsets."""
    for batch in batches:
        n = batch.num_rows
        if n == 0:
            continue
        dsts = batch.column(batch.schema.get_field_index("dsts"))
        ws = batch.column(batch.schema.get_field_index("ws"))
        if isinstance(dsts, pa.ChunkedArray):
            dsts = dsts.combine_chunks()
            ws = ws.combine_chunks()
        rank = batch.column(batch.schema.get_field_index("rank")).to_numpy(
            zero_copy_only=False
        )
        out_w = batch.column(batch.schema.get_field_index("out_w")).to_numpy(
            zero_copy_only=False
        )
        offsets = dsts.offsets.to_numpy(zero_copy_only=False)
        counts = np.diff(offsets)
        per_src = np.repeat(rank / out_w, counts)
        flat_w = ws.flatten().to_numpy(zero_copy_only=False)
        yield pa.RecordBatch.from_arrays(
            [dsts.flatten(), pa.array(per_src * flat_w, type=pa.float64())],
            names=["dst", "contrib"],
        )


def build_adjacency_blocks(
    edges: DataFrame,
    weight_col: str | None = None,
    chunk_size: int = 16384,
    num_partitions: int | None = None,
) -> DataFrame:
    """Salted-chunk CSR blocks ``(src, out_w, dsts array, ws array)``,
    hash-partitioned by ``src``.  Built once per graph; caller persists."""
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select("src", "dst", w.alias("w"))
    outs = e.groupBy("src").agg(
        F.sum("w").alias("out_w"), F.count(F.lit(1)).alias("out_deg")
    )
    n_chunks = F.greatest(F.ceil(F.col("out_deg") / F.lit(chunk_size)), F.lit(1))
    salted = e.join(outs, "src").withColumn(
        "chunk", F.pmod(F.xxhash64("src", "dst"), n_chunks)
    )
    blocks = salted.groupBy("src", "chunk").agg(
        F.first("out_w").alias("out_w"),
        F.collect_list("dst").alias("dsts"),
        F.collect_list("w").alias("ws"),
    )
    if num_partitions:
        return blocks.repartition(num_partitions, "src")
    return blocks.repartition("src")


def _scatter(blocks: DataFrame, ranks: DataFrame, kernel: str) -> DataFrame:
    if kernel not in ("jvm", "arrow"):
        raise ValueError(f"Unknown scatter kernel {kernel!r}; use 'jvm' or 'arrow'.")
    joined = blocks.join(
        ranks.select(F.col("id").alias("src"), "rank"), "src", "inner"
    )
    if kernel == "arrow":
        return joined.select("rank", "out_w", "dsts", "ws").mapInArrow(
            _scatter_arrow, schema=SCATTER_SCHEMA
        )
    # jvm: explode inside whole-stage codegen; arrays_zip keeps dst/w
    # pairs aligned without materializing structs in Python.
    z = joined.select(
        (F.col("rank") / F.col("out_w")).alias("r"),
        F.explode(F.arrays_zip("dsts", "ws")).alias("z"),
    )
    return z.select(
        F.col("z.dsts").alias("dst"), (F.col("r") * F.col("z.ws")).alias("contrib")
    )


def pagerank(
    edges: DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    weight_col: str | None = None,
    chunk_size: int = 16384,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    fixed_iterations: int | None = None,
    vertices: DataFrame | None = None,
    kernel: str = "jvm",
) -> DataFrame:
    """PageRank over a directed edge DataFrame ``(src, dst[, weight])``.

    For undirected semantics pass the symmetrized edge table (both
    orientations), matching how networkx converts a ``Graph``.
    ``vertices`` (optional ``(id)`` DataFrame) adds isolated vertices,
    which share teleport/dangling mass exactly as networkx's N does.

    Returns ``(id string, rank double)``; raises ``RuntimeError`` if the
    iteration does not converge within ``max_iter`` (mirroring
    ``nx.PowerIterationFailedConvergence``).

    ``fixed_iterations`` runs exactly that many power iterations with
    no convergence test (deterministic benchmark workload; skips one
    aggregation job per round).
    """
    if fixed_iterations is not None:
        max_iter = fixed_iterations
    spark = edges.sparkSession
    blocks = build_adjacency_blocks(edges, weight_col, chunk_size).persist()

    endpoint_ids = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    if vertices is not None:
        # Isolated vertices share teleport/dangling mass (nx counts
        # them in N), so an explicit vertex table changes every score.
        endpoint_ids = vertices.select("id").unionAll(endpoint_ids).distinct()
    # Dangling flag computed once: no out-edges → rank mass teleports.
    verts = (
        endpoint_ids.join(
            blocks.select(F.col("src").alias("id"))
            .distinct()
            .withColumn("__has_out", F.lit(True)),
            "id",
            "left",
        )
        .select("id", F.coalesce("__has_out", F.lit(False)).alias("has_out"))
        .persist()
    )
    n = verts.count()
    if n == 0:
        return spark.createDataFrame([], "id string, rank double")

    ranks = verts.select("id", "has_out", F.lit(1.0 / n).alias("rank"))
    ranks = ranks.localCheckpoint()

    start_iter = 0
    if checkpoint is not None:
        resumed = checkpoint.resume()
        if resumed is not None:
            start_iter, ranks = resumed
            ranks = ranks.select("id", "has_out", "rank")
            start_iter += 1

    for it in range(start_iter, max_iter):
        # Dangling mass as an in-plan broadcast 1-row aggregate: no
        # driver collect, so each iteration is ONE materializing job
        # (the checkpoint) plus — in convergence mode — one cheap agg
        # over the materialized state.
        dangle = F.broadcast(
            ranks.where(~F.col("has_out")).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dangle")
            )
        )
        contribs = _scatter(blocks, ranks, kernel)
        gathered = contribs.groupBy("dst").agg(F.sum("contrib").alias("gathered"))
        new_rank = (
            F.lit(alpha)
            * (
                F.coalesce("gathered", F.lit(0.0))
                + F.col("__dangle") / F.lit(float(n))
            )
            + F.lit((1.0 - alpha) / n)
        )
        new_ranks = (
            ranks.join(gathered, ranks["id"] == gathered["dst"], "left")
            .crossJoin(dangle)
            .select(
                "id",
                "has_out",
                new_rank.alias("__new"),
                F.abs(new_rank - F.col("rank")).alias("__diff"),
            )
            .withColumnRenamed("__new", "rank")
        )
        if checkpoint is not None and (it % checkpoint_every == 0):
            new_ranks = checkpoint.save(it, new_ranks)
        else:
            new_ranks = new_ranks.localCheckpoint()
        if fixed_iterations is None:
            # L1 delta from the already-materialized frame — a scan +
            # partial agg, no join, no recompute.
            err = new_ranks.agg(F.sum("__diff")).collect()[0][0]
            ranks = new_ranks.select("id", "has_out", "rank")
            if err < n * tol:
                blocks.unpersist()
                verts.unpersist()
                return ranks.select("id", "rank")
        else:
            ranks = new_ranks.select("id", "has_out", "rank")

    blocks.unpersist()
    verts.unpersist()
    if fixed_iterations is not None:
        return ranks.select("id", "rank")
    raise RuntimeError(f"PageRank failed to converge in {max_iter} iterations.")
