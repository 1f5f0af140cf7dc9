"""Distributed PageRank as sparse gather-scatter over CSR-style
adjacency blocks (north-rule op — not in the reference; SURVEY.md §2.6).

Semantics match ``networkx.pagerank`` exactly (power iteration with
damping ``alpha``, uniform teleport/dangling distribution, L1
convergence test ``err < N * tol`` — so per-vertex scores are
``allclose 1e-6`` against the oracle at convergence).

Scale design (each point measured on the 20M-edge bench graph)
--------------------------------------------------------------
- **Dictionary-encoded vertex ids** (SURVEY.md §1.2): external ids are
  arbitrary strings (``role:assistant``); iterating on them makes every
  hash/compare/shuffle pay string cost.  A one-time surrogate-id map
  (``monotonically_increasing_id`` — no global sort, scale-safe)
  converts the hot loop to long keys (+~30% throughput); results are
  decoded back on exit.  Inputs that are already integral skip the map.
- **Adjacency prep (once):** out-strength per source, then edges are
  grouped into *salted chunks* — ``chunk = hash(src, dst) %
  ceil(out_deg / chunk_size)`` — before ``collect_list``.  A hub vertex
  with 10^8 out-edges never produces one giant array row or one
  overloaded reducer: its adjacency is spread across ~deg/chunk_size
  hash-balanced rows.  This is the salted repartitioning the north rule
  mandates for hub skew.
- **Partition-aligned iteration state with flat lineage:** blocks are
  hash-partitioned by ``src`` once; each round's ranks frame is
  materialized with an eager ``localCheckpoint`` (each iteration
  references ranks THREE times — dangle, scatter, update join — so an
  un-truncated logical plan grows 3^rounds and OOMs the driver just
  *naming* the cache) and then re-aligned with an explicit
  ``repartition(P, vid).persist()``.  The realign exchange moves only
  |V| rows of longs+doubles; the CSR blocks (|E|-scale arrays) never
  move after build.  Net per-iteration exchanges: the gather transpose
  (inherent) + the tiny realign.
- **AQE is disabled inside the loop** (restored on exit): the
  iteration re-executes one fixed-shape plan over pre-partitioned
  state, so adaptive replanning has nothing to learn but costs a
  driver barrier per stage per round (serial, anti-scaling), and its
  64MB advisory target would coalesce the CPU-dense gather shuffle
  (small in bytes, expensive in hash-agg CPU) down to a few serialized
  tasks (measured 2x).  Skew is handled structurally instead: salted
  CSR chunks + map-side partial aggregation.
- **Scatter kernels**: ``jvm`` (default) — ``explode(arrays_zip)``
  inside whole-stage codegen; ``arrow`` — zero-copy ``mapInArrow`` CSR
  kernel (flatten list buffers + ``np.repeat``), the mandated
  pandas/Arrow SpMV formulation.  Both vectorized — no per-row Python.
- **Gather:** ``groupBy(dst).sum`` with map-side partial aggregation
  (hub in-degree combines locally before the exchange).
- **Dangling mass** is a carried-forward literal: graphs with no
  dangling vertices (checked once) never pay for it, and otherwise the
  next round's mass rides the same single agg as the L1 delta — no
  dedicated per-iteration driver job.
- **State / resume:** each ``checkpoint_every`` rounds the ranks frame
  is written (decoded to external ids, so a new driver with a fresh
  surrogate map resumes exactly) via :class:`~grandiso_networkx_spark.
  checkpoint.CheckpointManager`, with per-partition lineage metrics.
"""

from __future__ import annotations

import time
from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..checkpoint import CheckpointManager

_INTEGRAL = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
_AQE_KEY = "spark.sql.adaptive.enabled"


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
    hash-partitioned by ``src``.  Built once per graph; caller persists.

    Kept id-type-generic (used directly by callers); :func:`pagerank`
    builds its own long-keyed blocks internally.
    """
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select("src", "dst", w.alias("w"))
    return _blocks_from(e, chunk_size, num_partitions, "src", "dst")


def _blocks_from(
    e: DataFrame,
    chunk_size: int,
    num_partitions: int | None,
    src: str,
    dst: str,
) -> DataFrame:
    outs = e.groupBy(src).agg(
        F.sum("w").alias("out_w"), F.count(F.lit(1)).alias("out_deg")
    )
    n_chunks = F.greatest(F.ceil(F.col("out_deg") / F.lit(chunk_size)), F.lit(1))
    salted = e.join(outs, src).withColumn(
        "chunk", F.pmod(F.xxhash64(src, dst), n_chunks)
    )
    blocks = salted.groupBy(src, "chunk").agg(
        F.first("out_w").alias("out_w"),
        F.collect_list(dst).alias("dsts"),
        F.collect_list("w").alias("ws"),
    )
    if num_partitions:
        return blocks.repartition(num_partitions, src)
    return blocks.repartition(src)


def _scatter(
    blocks: DataFrame, ranks: DataFrame, kernel: str, dst_type: str = "long"
) -> DataFrame:
    if kernel not in ("jvm", "arrow"):
        raise ValueError(f"Unknown scatter kernel {kernel!r}; use 'jvm' or 'arrow'.")
    key = blocks.columns[0]  # 'src' or 'vid'-keyed alias
    joined = blocks.join(
        ranks.select(F.col(ranks.columns[0]).alias(key), "rank"), key, "inner"
    )
    if kernel == "arrow":
        return joined.select("rank", "out_w", "dsts", "ws").mapInArrow(
            _scatter_arrow, schema=f"dst {dst_type}, contrib double"
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
    personalization: DataFrame | None = None,
    nstart: DataFrame | None = None,
    kernel: str = "jvm",
    num_partitions: int | None = None,
    iter_seconds: list | None = None,
    round_hook=None,
) -> DataFrame:
    """PageRank over a directed edge DataFrame ``(src, dst[, weight])``.

    For undirected semantics pass the symmetrized edge table (both
    orientations), matching how networkx converts a ``Graph``.
    ``vertices`` (optional ``(id)`` DataFrame) adds isolated vertices,
    which share teleport/dangling mass exactly as networkx's N does.

    ``personalization`` (optional ``(id, weight)`` DataFrame) replaces
    the uniform teleport/dangling distribution with the normalized
    given weights — ``networkx.pagerank(personalization=...)``
    semantics: ids absent from the table get weight 0, the dangling
    distribution defaults to the personalization vector, and an
    all-zero vector raises ``ValueError``.  The vector rides the state
    frame as a ``tele`` column, so the hot loop's shape is unchanged.

    ``nstart`` (optional ``(id, weight)`` DataFrame) sets the starting
    rank vector — ``networkx.pagerank(nstart=...)`` semantics: values
    are normalized by their sum, ids absent from the table start at 0.
    Only the trajectory changes (any start converges to the same fixed
    point); with ``fixed_iterations`` it changes the result, which is
    what the parity test pins.

    Returns ``(id, rank double)`` with ``id`` in the input's id type;
    raises ``RuntimeError`` if the iteration does not converge within
    ``max_iter`` (mirroring ``nx.PowerIterationFailedConvergence``).

    ``fixed_iterations`` runs exactly that many power iterations with
    no convergence test (deterministic benchmark workload; skips one
    aggregation job per round).

    ``iter_seconds``: caller-supplied list; each round's wall seconds
    (covering that round's materializing jobs) is appended — the
    instrumentation the scaling bench uses to time steady-state rounds
    without cross-run subtraction.

    ``round_hook`` (benchmark-only, requires ``fixed_iterations``):
    called after every completed round with the round index; return
    False to stop and get the current ranks back.  The hook may block
    (the scaling bench parks the loop at a cross-process barrier
    between its measurement windows — iteration state, caches and CSR
    blocks stay live, so a window never pays a rebuild).
    """
    if fixed_iterations is not None:
        max_iter = fixed_iterations
    spark = edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select("src", "dst", w.alias("w"))

    # -- surrogate-id encoding (skipped for already-integral ids) ----------
    schema = {f.name: f.dataType for f in e.schema.fields}
    integral = isinstance(schema["src"], _INTEGRAL) and isinstance(
        schema["dst"], _INTEGRAL
    )
    if vertices is not None:
        vtype = dict((f.name, f.dataType) for f in vertices.schema.fields)["id"]
        integral = integral and isinstance(vtype, _INTEGRAL)

    persisted: list[DataFrame] = []

    def _persist(df: DataFrame) -> DataFrame:
        df = df.persist()
        persisted.append(df)
        return df

    if integral:
        vmap = None
        e2 = e.select(
            F.col("src").cast("long").alias("s"),
            F.col("dst").cast("long").alias("d"),
            "w",
        )
        ids = e2.select(F.col("s").alias("vid")).unionAll(
            e2.select(F.col("d").alias("vid"))
        )
        if vertices is not None:
            ids = ids.unionAll(vertices.select(F.col("id").cast("long").alias("vid")))
        endpoint_vids = ids.distinct()
    else:
        ids = e.select(F.col("src").alias("id")).unionAll(
            e.select(F.col("dst").alias("id"))
        )
        if vertices is not None:
            ids = ids.unionAll(vertices.select("id"))
        # persist() is disk-backed on eviction, so the surrogate ids are
        # stable for the lifetime of this job (mono ids must never be
        # recomputed after first materialization).
        vmap = _persist(
            ids.distinct().select("id", F.monotonically_increasing_id().alias("vid"))
        )
        e2 = (
            e.join(
                vmap.select(F.col("id").alias("src"), F.col("vid").alias("s")), "src"
            )
            .join(vmap.select(F.col("id").alias("dst"), F.col("vid").alias("d")), "dst")
            .select("s", "d", "w")
        )
        endpoint_vids = vmap.select("vid")

    blocks = _persist(_blocks_from(e2, chunk_size, P, "s", "d"))

    # Dangling flag computed once: no out-edges → rank mass teleports.
    verts = _persist(
        endpoint_vids.join(
            blocks.select(F.col("s").alias("vid"))
            .distinct()
            .withColumn("__has_out", F.lit(True)),
            "vid",
            "left",
        )
        .select("vid", F.coalesce("__has_out", F.lit(False)).alias("has_out"))
        .repartition(P, "vid")
    )
    n = verts.count()

    def _decode(df: DataFrame, cols: list[str]) -> DataFrame:
        if vmap is not None:
            return df.join(vmap, "vid").select("id", *cols)
        return df.select(F.col("vid").alias("id"), *cols)

    def _encode(df: DataFrame) -> DataFrame:
        if vmap is not None:
            return df.join(vmap, "id").select("vid", "has_out", "tele", "rank")
        return df.select(
            F.col("id").cast("long").alias("vid"), "has_out", "tele", "rank"
        )

    def _cleanup() -> None:
        for df in persisted:
            df.unpersist()

    if n == 0:
        _cleanup()
        out_t = "string" if not integral else "long"
        return spark.createDataFrame([], f"id {out_t}, rank double")

    # Teleport/dangling distribution as a per-vertex state column.
    if personalization is not None:
        p = personalization.select("id", F.col("weight").cast("double").alias("__w"))
        if vmap is not None:
            p = p.join(vmap, "id").select("vid", "__w")
        else:
            p = p.select(F.col("id").cast("long").alias("vid"), "__w")
        psum = p.agg(F.coalesce(F.sum("__w"), F.lit(0.0))).collect()[0][0]
        if psum <= 0.0:
            _cleanup()
            raise ValueError("personalization weights must sum to a positive value")
        tele_verts = verts.join(p, "vid", "left").select(
            "vid",
            "has_out",
            F.coalesce(F.col("__w") / F.lit(float(psum)), F.lit(0.0)).alias("tele"),
        )
    else:
        tele_verts = verts.select("vid", "has_out", F.lit(1.0 / n).alias("tele"))

    if nstart is not None:
        ns = nstart.select("id", F.col("weight").cast("double").alias("__r0"))
        if vmap is not None:
            ns = ns.join(vmap, "id").select("vid", "__r0")
        else:
            ns = ns.select(F.col("id").cast("long").alias("vid"), "__r0")
        ssum = ns.agg(F.coalesce(F.sum("__r0"), F.lit(0.0))).collect()[0][0]
        if ssum <= 0.0:
            _cleanup()
            raise ValueError("nstart weights must sum to a positive value")
        ranks = _persist(
            tele_verts.join(ns, "vid", "left").select(
                "vid",
                "has_out",
                "tele",
                F.coalesce(F.col("__r0") / F.lit(float(ssum)), F.lit(0.0)).alias(
                    "rank"
                ),
            )
        )
    else:
        ranks = _persist(
            tele_verts.select("vid", "has_out", "tele", F.lit(1.0 / n).alias("rank"))
        )

    start_iter = 0
    if checkpoint is not None:
        resumed = checkpoint.resume()
        if resumed is not None:
            start_iter, saved = resumed
            ranks = _persist(_encode(saved).repartition(P, "vid"))
            start_iter += 1

    # Measured per-round cost knobs (defaults are the winners on the
    # 10M-edge pinned-core bench; env-overridable for A/B):
    # - realign OFF: the update join already hash-partitions the new
    #   ranks by vid into P partitions and localCheckpoint preserves
    #   that, so the explicit repartition+persist is a redundant |V|-row
    #   exchange + an extra job per round. Worst case without it the
    #   scatter join re-exchanges the |V|-row ranks side — never the
    #   |E|-scale CSR blocks (their persisted partitioning satisfies
    #   the join).
    # - dangle as literal ON: the mass is injected as a literal instead
    #   of a broadcast 1-row subquery (broadcast build + exchange inside
    #   the main job).  The literal is CARRIED FORWARD, not collected
    #   per round: graphs with no dangling vertices (checked once) pay
    #   nothing, and in convergence mode the next round's mass rides
    #   the same single agg as the L1 delta — per-round driver jobs
    #   drop from 3 to 1+agg, a direct serial-fraction cut that the
    #   N->4N scaling legs feel hardest at the wide leg.
    import os as _os

    realign = n >= 200_000 and _os.environ.get("GISPARK_PR_REALIGN", "0") == "1"
    dangle_literal = _os.environ.get("GISPARK_PR_DANGLE_LITERAL", "1") == "1"

    # One-time: does this graph have dangling vertices at all?  (Bench
    # and most derived link graphs do not — every participant/tool that
    # appears also speaks — so the per-round mass is identically 0.)
    has_dangling = verts.where(~F.col("has_out")).limit(1).count() > 0
    if has_dangling and dangle_literal:
        dm_next = ranks.where(~F.col("has_out")).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0))
        ).collect()[0][0]
    else:
        dm_next = 0.0

    # AQE is disabled for the whole loop, not just partition
    # coalescing: every iteration re-executes the SAME fixed-shape
    # plan over pre-sized, pre-partitioned state, so runtime replanning
    # can discover nothing — but it materializes each stage as its own
    # job with a driver barrier between, a per-iteration serial cost
    # that caps scaling (measured on the 20M-edge pinned-core bench:
    # 4.1s -> 3.25s per iteration at 8 cores, and N->4N efficiency
    # 0.83 -> 0.90, AQE on -> off).  Skew is handled structurally
    # (salted CSR chunks + map-side partial aggregation), not by AQE.
    old_aqe = spark.conf.get(_AQE_KEY, "true")
    spark.conf.set(_AQE_KEY, "false")
    prev: list[DataFrame] = [ranks]
    try:
        for it in range(start_iter, max_iter):
            _t_round = time.monotonic()
            # Dangling mass: carried-forward literal (computed from last
            # round's combined agg, or identically 0 when the graph has
            # no dangling vertices) — no extra per-round driver job.
            if dangle_literal:
                dangle = None
                dangle_col = F.lit(float(dm_next))
            else:
                dangle = F.broadcast(
                    ranks.where(~F.col("has_out")).agg(
                        F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dangle")
                    )
                )
                dangle_col = F.col("__dangle")
            contribs = _scatter(
                blocks.select(
                    F.col("s").alias("vid"), "chunk", "out_w", "dsts", "ws"
                ).drop("chunk"),
                ranks,
                kernel,
            )
            # Map-side partial aggregation here is load-bearing for hub
            # skew: a hub dst's contributions combine locally before the
            # exchange, so the reduce side never sees a hot key.  (A
            # pre-repartition(dst) of the raw contribs — attractive
            # because it keeps per-task agg maps small — was measured
            # 5x WORSE on the Zipf bench graph: it ships every raw hub
            # row to one partition.)
            gathered = contribs.groupBy("dst").agg(
                F.sum("contrib").alias("gathered")
            )
            new_rank = (
                F.lit(alpha)
                * (
                    F.coalesce("gathered", F.lit(0.0))
                    + dangle_col * F.col("tele")
                )
                + F.lit(1.0 - alpha) * F.col("tele")
            )
            joined = ranks.join(gathered, ranks["vid"] == gathered["dst"], "left")
            if dangle is not None:
                joined = joined.crossJoin(dangle)
            new_ranks = (
                joined
                .select(
                    "vid",
                    "has_out",
                    "tele",
                    new_rank.alias("__new"),
                    F.abs(new_rank - F.col("rank")).alias("__diff"),
                )
                .withColumnRenamed("__new", "rank")
            )
            if checkpoint is not None and (it % checkpoint_every == 0):
                # Saved state is DECODED so a fresh driver (with a fresh
                # surrogate map) resumes exactly.  The reloaded Parquet
                # frame is the flat-lineage state for the next round.
                saved = checkpoint.save(
                    it, _decode(new_ranks, ["has_out", "tele", "rank", "__diff"])
                )
                err_frame = saved
                flat = _encode(saved.drop("__diff")).withColumn("__diff", F.lit(0.0))
            else:
                # Eager materialization + flat lineage (see module doc:
                # the logical plan otherwise grows 3^rounds).
                flat = new_ranks.localCheckpoint()
                err_frame = flat
            # ONE combined agg over the already-materialized frame
            # (single scan, no join, no recompute) serves both the L1
            # convergence delta and the NEXT round's dangling mass.
            need_dangle = has_dangling and dangle_literal
            if fixed_iterations is None:
                aggs = [F.coalesce(F.sum("__diff"), F.lit(0.0))]
                if need_dangle:
                    aggs.append(
                        F.coalesce(
                            F.sum(
                                F.when(~F.col("has_out"), F.col("rank")).otherwise(0.0)
                            ),
                            F.lit(0.0),
                        )
                    )
                row = err_frame.agg(*aggs).collect()[0]
                err = row[0]
                if need_dangle:
                    dm_next = row[1]
                if checkpoint is not None and (it % checkpoint_every == 0):
                    checkpoint.annotate(it, {"l1_delta": err})
            else:
                err = None
                if need_dangle:
                    dm_next = err_frame.agg(
                        F.coalesce(
                            F.sum(
                                F.when(~F.col("has_out"), F.col("rank")).otherwise(0.0)
                            ),
                            F.lit(0.0),
                        )
                    ).collect()[0][0]
            if realign:
                # Re-align with the blocks partitioning so the next
                # scatter join moves |V| rows instead of the |E|-scale
                # CSR arrays; persisted because three consumers read it.
                new_state = flat.repartition(P, "vid").persist()
            else:
                new_state = flat
            for p_df in prev:
                p_df.unpersist()
            prev = [new_state]
            ranks = new_state
            if iter_seconds is not None:
                iter_seconds.append(time.monotonic() - _t_round)
            if (
                round_hook is not None
                and fixed_iterations is not None
                and not round_hook(it)
            ):
                break
            if err is not None and err < n * tol:
                out = _decode(ranks.select("vid", "rank"), ["rank"])
                out = out.localCheckpoint()  # detach from caches
                _cleanup()
                return out
    finally:
        spark.conf.set(_AQE_KEY, old_aqe)

    if fixed_iterations is not None:
        out = _decode(ranks.select("vid", "rank"), ["rank"]).localCheckpoint()
        _cleanup()
        return out
    _cleanup()
    raise RuntimeError(f"PageRank failed to converge in {max_iter} iterations.")
