"""Batched multi-seed personalized PageRank (random-walk-with-restart).

Not in the reference (grandiso has no vertex analytics at all); the
single-vector personalized mode already exists on
:func:`~grandiso_networkx_spark.operators.pagerank.pagerank`
(``personalization=``, networkx semantics).  This operator is the
*batched* variant a recommender / GNN-sampling pipeline actually runs:
ONE iteration loop computes the restart-to-seed PPR vector for EVERY
seed simultaneously, with state keyed ``(seed, vid)``.

Semantics per seed ``s`` match ``networkx.pagerank(G,
personalization={s: 1.0})`` exactly (dangling mass defaults to the
personalization vector, i.e. restarts at the seed):

    r'(v) = alpha * (sum_{u->v} r(u) * w(u,v) / out_w(u)
                     + dangle_s * [v == s])
            + (1 - alpha) * [v == s]

Scale design
------------
- **Sparse state.** The state frame holds only nonzero entries — a
  seed's mass reaches exactly the vertices within ``i`` hops after
  ``i`` rounds, so cold regions of a 100 TB graph are never stored,
  shuffled, or scanned.  (The dense recurrence assigns exactly 0.0 to
  unreachable vertices, so sparse == dense.)  Batching ``k`` seeds is
  one loop whose shuffle key is ``(seed, dst)`` — k independent runs
  collapse into one job sequence, and skew from a hub dst is spread
  across seeds by the composite key.
- **One shuffle per round.** Gather contributions (explode over the
  salted CSR blocks of :func:`build_adjacency_blocks`), the per-seed
  restart term, and the per-seed dangling term are unioned as
  ``(seed, vid, term)`` rows and summed by ONE ``groupBy(seed, vid)``
  with map-side combine (a hub's in-contributions combine locally).
- **Dangling mass stays in-plan.** Per-seed dangling sums ride the
  same union→groupBy as the gather terms (each dangling state row
  emits one ``(seed, seed, alpha*rank)`` row) — no per-round driver
  collect, no per-seed jobs.
- **Flat lineage.** The state is ``localCheckpoint``-ed per round
  (same rationale as pagerank.py: multiple consumers would otherwise
  re-execute an exponentially growing plan).
- **Convergence** (when ``fixed_iterations`` is None): per-seed L1
  delta via a union-sum (old ranks negated, one groupBy — no
  full-outer join), stop when the max per-seed delta < N * tol,
  matching each seed's independent networkx stop criterion (each
  converged seed would have stopped at-or-before the batch does, and
  extra iterations only tighten toward the same fixed point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint

from .pagerank import build_adjacency_blocks

_AQE_KEY = "spark.sql.adaptive.enabled"


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    weight_col: str | None = None,
    fixed_iterations: int | None = None,
    chunk_size: int = 16384,
    num_partitions: int | None = None,
) -> DataFrame:
    """Multi-seed PPR over ``edges (src, dst[, weight])``.

    ``seeds``: one-column ``(id)`` DataFrame of restart vertices; each
    must appear in the graph (ValueError otherwise, mirroring how a
    zero-mass personalization vector errors in networkx).

    Returns ``(seed, id, rank double)`` — only nonzero entries, i.e.
    vertices reachable from (or equal to) the seed.  With
    ``fixed_iterations`` runs exactly that many rounds (deterministic,
    SQL-checkable); otherwise iterates to per-seed L1 convergence and
    raises RuntimeError past ``max_iter`` like nx's
    PowerIterationFailedConvergence.
    """
    spark = edges.sparkSession
    if fixed_iterations is not None:
        max_iter = fixed_iterations

    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select("src", "dst", w.alias("w"))

    persisted: list[DataFrame] = []

    def _persist(df: DataFrame) -> DataFrame:
        df = df.persist()
        persisted.append(df)
        return df

    def _cleanup() -> None:
        for df in persisted:
            df.unpersist()

    # Everything below runs under one try/finally: _cleanup() is
    # idempotent and MUST run even when an exception escapes mid-loop
    # (e.g. a per-round collect failing) — otherwise the persisted
    # blocks/seeds/state frames leak executor memory.
    old_aqe: str | None = None
    try:
        blocks = _persist(
            build_adjacency_blocks(
                e, weight_col="w", chunk_size=chunk_size,
                num_partitions=num_partitions,
            )
        )
        sd = _persist(
            seeds.select(F.col(seeds.columns[0]).alias("seed")).distinct()
        )

        # Seed validation + N (for the convergence threshold): two tiny jobs.
        verts = e.select(F.col("src").alias("id")).unionAll(
            e.select(F.col("dst").alias("id"))
        ).distinct()
        n = verts.count()
        n_missing = sd.join(
            verts, sd["seed"] == verts["id"], "left_anti"
        ).count()
        if n_missing:
            raise ValueError(f"{n_missing} seed(s) not present in the graph")

        # State: sparse (seed, vid, rank); round 0 = unit mass at the seed.
        state = _persist(sd.select("seed", F.col("seed").alias("vid"),
                                   F.lit(1.0).alias("rank")))

        # Fixed-shape loop — same rationale as pagerank.py for pinning
        # AQE off.
        old_aqe = spark.conf.get(_AQE_KEY, "true")
        spark.conf.set(_AQE_KEY, "false")
        it = 0
        while it < max_iter:
            # Gather: state ⋈ CSR blocks (left join keeps dangling rows,
            # whose null out_w marks them), explode JVM-side.
            j = state.join(
                blocks.withColumnRenamed("src", "vid"), "vid", "left"
            )
            contribs = (
                j.where(F.col("out_w").isNotNull())
                .select(
                    "seed",
                    (F.col("rank") / F.col("out_w")).alias("r"),
                    F.explode(F.arrays_zip("dsts", "ws")).alias("z"),
                )
                .select(
                    "seed",
                    F.col("z.dsts").alias("vid"),
                    (F.lit(alpha) * F.col("r") * F.col("z.ws")).alias("term"),
                )
            )
            # Dangling rows restart at the seed (alpha * rank each);
            # dedup by chunk: a dangling vid has NO block rows, so the
            # left join emitted exactly one row for it.
            dangle = j.where(F.col("out_w").isNull()).select(
                "seed",
                F.col("seed").alias("vid"),
                (F.lit(alpha) * F.col("rank")).alias("term"),
            )
            # Restart term (1 - alpha) at every seed, every round.
            restart = sd.select(
                "seed",
                F.col("seed").alias("vid"),
                F.lit(1.0 - alpha).alias("term"),
            )
            new_state = (
                contribs.unionAll(dangle)
                .unionAll(restart)
                .groupBy("seed", "vid")
                .agg(F.sum("term").alias("rank"))
                .transform(flat_checkpoint)
            )
            it += 1
            if fixed_iterations is None:
                # Per-seed L1 delta via union-sum (single shuffle).
                delta = (
                    new_state.select("seed", "vid", "rank")
                    .unionAll(
                        state.select("seed", "vid", (-F.col("rank")).alias("rank"))
                    )
                    .groupBy("seed", "vid")
                    .agg(F.sum("rank").alias("d"))
                    .groupBy("seed")
                    .agg(F.sum(F.abs(F.col("d"))).alias("err"))
                    .agg(F.coalesce(F.max("err"), F.lit(0.0)))
                    .collect()[0][0]
                )
            else:
                delta = None
            # Old localCheckpoint blocks are freed by the ContextCleaner
            # once the previous state frame is unreferenced.
            state = new_state
            if delta is not None and delta < n * tol:
                return state.select("seed", F.col("vid").alias("id"), "rank")

        if fixed_iterations is not None:
            # state is localCheckpoint-ed, so it survives _cleanup().
            return state.select("seed", F.col("vid").alias("id"), "rank")
        raise RuntimeError(
            f"PPR failed to converge in {max_iter} iterations."
        )
    finally:
        if old_aqe is not None:
            spark.conf.set(_AQE_KEY, old_aqe)
        _cleanup()
