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
  mandates for hub skew.
- **Per iteration:** ranks ⋈ blocks on ``src`` (AQE skew-join splits
  the hub's replicated chunk rows), then one vectorized Arrow kernel
  (`mapInPandas`, pure numpy — no per-row Python) scatters
  ``rank * w / out_w`` along each chunk's dst array, and
  ``groupBy(dst).sum`` gathers with map-side partial aggregation.
- **State:** the ranks DataFrame is the only iteration state; each
  round is checkpointed (lineage truncation + resumability + per-
  partition metrics) via :class:`~grandiso_networkx_spark.checkpoint.
  CheckpointManager` or ``localCheckpoint``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..checkpoint import CheckpointManager

SCATTER_SCHEMA = "dst string, contrib double"


def _scatter_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Vectorized CSR scatter: expand (rank/out_w) along dst chunks."""
    for pdf in batches:
        if len(pdf) == 0:
            yield pd.DataFrame({"dst": pd.Series(dtype=object), "contrib": pd.Series(dtype=float)})
            continue
        chunks = pdf["dsts"].to_numpy()
        counts = np.fromiter((len(c) for c in chunks), dtype=np.int64, count=len(chunks))
        per_src = np.repeat(
            pdf["rank"].to_numpy(dtype=np.float64)
            / pdf["out_w"].to_numpy(dtype=np.float64),
            counts,
        )
        dsts = np.concatenate([np.asarray(c, dtype=object) for c in chunks])
        ws = np.concatenate(
            [np.asarray(c, dtype=np.float64) for c in pdf["ws"].to_numpy()]
        )
        yield pd.DataFrame({"dst": dsts, "contrib": per_src * ws})


def build_adjacency_blocks(
    edges: DataFrame, weight_col: str | None = None, chunk_size: int = 16384
) -> DataFrame:
    """Salted-chunk CSR blocks: ``(src, out_w, dsts array, ws array)``.

    Built once per graph, persisted by the caller.  ``out_w`` is the
    total out-strength of ``src`` (repeated on each chunk row).
    """
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select("src", "dst", w.alias("w"))
    outs = e.groupBy("src").agg(
        F.sum("w").alias("out_w"), F.count(F.lit(1)).alias("out_deg")
    )
    n_chunks = F.greatest(F.ceil(F.col("out_deg") / F.lit(chunk_size)), F.lit(1))
    salted = e.join(outs, "src").withColumn(
        "chunk", F.pmod(F.xxhash64("src", "dst"), n_chunks)
    )
    return salted.groupBy("src", "chunk").agg(
        F.first("out_w").alias("out_w"),
        F.collect_list("dst").alias("dsts"),
        F.collect_list("w").alias("ws"),
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
) -> DataFrame:
    """PageRank over a directed edge DataFrame ``(src, dst[, weight])``.

    For undirected semantics pass the symmetrized edge table (both
    orientations), matching how networkx converts a ``Graph``.

    Returns ``(id string, rank double)``; raises ``RuntimeError`` if the
    iteration does not converge within ``max_iter`` (mirroring
    ``nx.PowerIterationFailedConvergence``).

    ``fixed_iterations`` runs exactly that many power iterations with
    no convergence test (deterministic benchmark workload; also the
    recommended production mode when score stability is verified
    offline — it skips one aggregation job per round).
    """
    if fixed_iterations is not None:
        max_iter = fixed_iterations
    spark = edges.sparkSession
    blocks = build_adjacency_blocks(edges, weight_col, chunk_size).persist()

    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    # Dangling flag computed once: no out-edges → rank mass teleports.
    vertices = (
        vertices.join(
            blocks.select(F.col("src").alias("id")).distinct().withColumn(
                "__has_out", F.lit(True)
            ),
            "id",
            "left",
        )
        .select("id", F.coalesce("__has_out", F.lit(False)).alias("has_out"))
        .persist()
    )
    n = vertices.count()
    if n == 0:
        return spark.createDataFrame([], "id string, rank double")

    ranks = vertices.select("id", "has_out", F.lit(1.0 / n).alias("rank"))
    ranks = ranks.localCheckpoint()

    start_iter = 0
    if checkpoint is not None:
        resumed = checkpoint.resume()
        if resumed is not None:
            start_iter, ranks = resumed
            start_iter += 1

    for it in range(start_iter, max_iter):
        danglesum = (
            ranks.where(~F.col("has_out")).agg(F.sum("rank")).collect()[0][0] or 0.0
        )
        joined = blocks.join(
            ranks.select(F.col("id").alias("src"), "rank"), "src", "inner"
        ).select("rank", "out_w", "dsts", "ws")
        contribs = joined.mapInPandas(_scatter_kernel, schema=SCATTER_SCHEMA)
        gathered = contribs.groupBy("dst").agg(F.sum("contrib").alias("gathered"))
        new_ranks = (
            vertices.join(gathered, vertices["id"] == gathered["dst"], "left")
            .select(
                "id",
                "has_out",
                (
                    F.lit(alpha)
                    * (F.coalesce("gathered", F.lit(0.0)) + F.lit(danglesum / n))
                    + F.lit((1.0 - alpha) / n)
                ).alias("rank"),
            )
        )
        if checkpoint is not None and (it % checkpoint_every == 0):
            new_ranks = checkpoint.save(it, new_ranks, {"danglesum": danglesum})
        else:
            new_ranks = new_ranks.localCheckpoint()
        if fixed_iterations is None:
            err = (
                new_ranks.join(
                    ranks.select(F.col("id"), F.col("rank").alias("__old")), "id"
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("__old"))))
                .collect()[0][0]
            )
            ranks = new_ranks
            if err < n * tol:
                blocks.unpersist()
                vertices.unpersist()
                return ranks.select("id", "rank")
        else:
            ranks = new_ranks

    blocks.unpersist()
    vertices.unpersist()
    if fixed_iterations is not None:
        return ranks.select("id", "rank")
    raise RuntimeError(f"PageRank failed to converge in {max_iter} iterations.")
