"""Single-node throughput comparison vs the reference's execution model.

The task criterion: match-or-beat the reference's single-node
throughput at the same data scale.  grandiso itself is a pure-Python,
single-threaded matcher (SURVEY.md §3.1: no thread/process boundary
anywhere) and is not installed here, so the stand-ins are:

- **Motif**: ``networkx.isomorphism.DiGraphMatcher.
  subgraph_monomorphisms_iter`` — the VF2 engine grandiso's own test
  suite uses as its correctness oracle (`/root/reference/grandiso/
  test_grandiso.py:5`, `:109-174`) and benchmarks against in its README
  chart.  Same host graph, same motif, count of all monomorphisms
  (identical result-set semantics — no symmetry breaking).
- **PageRank**: the pure-Python power iteration in ``tests/oracles.py``
  (networkx's own `_pagerank_python` shape — dict-of-lists gather, the
  reference ecosystem's single-node formulation), same graph, same
  fixed iteration count.

Both single-node legs run single-threaded, like the reference.  The
Spark legs run the SAME workload through this engine at ``local[2]``
(the scaling bench's N leg — deliberately the SMALLEST parallelism we
report anywhere) and ``local[32]``.  Writes ``BENCH/REFERENCE.md``.

Usage: python scripts/reference_compare.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_VERTICES = int(os.environ.get("REFCMP_VERTICES", 50_000))
N_EDGES = int(os.environ.get("REFCMP_EDGES", 400_000))
PR_ITERS = int(os.environ.get("REFCMP_PR_ITERS", 10))
# Second PageRank scale (10x): where the engine's fixed per-round cost
# amortizes and the single-node model pays linearly.  The motif leg
# stays at the base scale only — VF2 is already 100x+ slower there.
PR_BIG_VERTICES = int(os.environ.get("REFCMP_BIG_VERTICES", 500_000))
PR_BIG_EDGES = int(os.environ.get("REFCMP_BIG_EDGES", 4_000_000))


def edge_list(n_vertices: int, n_edges: int, seed: int = 42) -> list[tuple[int, int]]:
    """Driver-side mirror of bench.powerlaw_graph (same xxhash64 family
    via Spark, collected once so BOTH engines see the identical graph)."""
    from grandiso_networkx_spark.session import get_spark
    import bench

    spark = get_spark(app_name="refcmp-gen", master="local[8]", shuffle_partitions=16)
    rows = bench.powerlaw_graph(spark, n_vertices, n_edges, seed=seed).collect()
    spark.stop()
    return [(r.src, r.dst) for r in rows]


def single_node_motif(edges: list[tuple[int, int]]) -> tuple[int, float]:
    import networkx as nx
    from networkx.algorithms import isomorphism

    host = nx.DiGraph(edges)
    motif = nx.DiGraph([("A", "B"), ("B", "C")])
    t0 = time.monotonic()
    n = sum(
        1
        for _ in isomorphism.DiGraphMatcher(
            host, motif
        ).subgraph_monomorphisms_iter()
    )
    return n, time.monotonic() - t0


def single_node_pagerank(edges: list[tuple[int, int]]) -> float:
    from tests.oracles import pagerank_oracle

    t0 = time.monotonic()
    pagerank_oracle([(str(u), str(v), 1.0) for u, v in edges], fixed_iter=PR_ITERS)
    return time.monotonic() - t0


def spark_legs(edges: list[tuple[int, int]], cpus: int, motif: bool = True) -> dict:
    from pyspark.sql import functions as F

    from grandiso_networkx_spark.graph import HostGraph
    from grandiso_networkx_spark.operators.match import find_motifs_df
    from grandiso_networkx_spark.operators.pagerank import pagerank
    from grandiso_networkx_spark.plans.motif import Motif
    from grandiso_networkx_spark.session import get_spark

    spark = get_spark(
        app_name=f"refcmp-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(16, cpus * 2),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    e = spark.createDataFrame(edges, "src long, dst long").persist()
    e.count()

    out = {"cpus": cpus}
    if motif:
        host = HostGraph(e, directed=True)
        m = Motif(directed=True)
        m.add_edge("A", "B")
        m.add_edge("B", "C")
        matches = find_motifs_df(m, host).count()  # warm (JIT + plan)
        t0 = time.monotonic()
        matches = find_motifs_df(m, host).count()
        out["motif_sec"] = time.monotonic() - t0
        out["matches"] = matches

    pagerank(e, fixed_iterations=PR_ITERS).agg(F.sum("rank")).collect()  # warm
    t0 = time.monotonic()
    pagerank(e, fixed_iterations=PR_ITERS).agg(F.sum("rank")).collect()
    out["pr_sec"] = time.monotonic() - t0
    spark.stop()
    return out


def main() -> None:
    edges = edge_list(N_VERTICES, N_EDGES)
    ne = len(edges)
    print(f"graph A: {N_VERTICES} vertices, {ne} edges", flush=True)

    ref_matches, ref_motif_sec = single_node_motif(edges)
    print(f"VF2 motif: {ref_matches} matches in {ref_motif_sec:.1f}s", flush=True)
    ref_pr_sec = single_node_pagerank(edges)
    print(f"python pagerank: {PR_ITERS} iters in {ref_pr_sec:.1f}s", flush=True)

    legs = [spark_legs(edges, 2), spark_legs(edges, 32)]
    for leg in legs:
        assert leg["matches"] == ref_matches, (leg, ref_matches)

    big = edge_list(PR_BIG_VERTICES, PR_BIG_EDGES, seed=7)
    nbig = len(big)
    print(f"graph B: {PR_BIG_VERTICES} vertices, {nbig} edges", flush=True)
    ref_pr_big_sec = single_node_pagerank(big)
    print(f"python pagerank big: {ref_pr_big_sec:.1f}s", flush=True)
    big_legs = [spark_legs(big, 2, motif=False), spark_legs(big, 32, motif=False)]
    del big

    report = {
        "vertices": N_VERTICES,
        "edges": ne,
        "pr_iters": PR_ITERS,
        "reference": {
            "motif_matches": ref_matches,
            "motif_sec": round(ref_motif_sec, 2),
            "pagerank_sec": round(ref_pr_sec, 2),
        },
        "spark": legs,
        "pagerank_big": {
            "vertices": PR_BIG_VERTICES,
            "edges": nbig,
            "reference_sec": round(ref_pr_big_sec, 2),
            "spark": big_legs,
        },
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/reference_compare.json", "w") as f:
        json.dump(report, f, indent=1)

    def row(name, sec, work):
        return f"| {name} | {sec:.1f} | {work / sec:,.0f} |"

    md = f"""# BENCH/REFERENCE.md — single-node throughput vs the reference model

Same deterministic graphs (`bench.powerlaw_graph`), same queries,
identical result counts (asserted in-script).  The reference
stand-ins are single-threaded pure Python, exactly like grandiso's
execution model: VF2 (`DiGraphMatcher.subgraph_monomorphisms_iter`)
is the oracle+baseline grandiso's own tests and README chart compare
against; PageRank is the dict-based power iteration (networkx
`_pagerank_python` shape).

## Motif ({N_VERTICES:,}v/{ne:,}e): directed 2-path count = {ref_matches:,}

| engine | sec | matches/sec |
|---|---|---|
{row("VF2 single-thread (reference model)", ref_motif_sec, ref_matches)}
{row("this engine, local[2]", legs[0]["motif_sec"], ref_matches)}
{row("this engine, local[32]", legs[1]["motif_sec"], ref_matches)}

## PageRank: {PR_ITERS} fixed power iterations, two scales

{N_VERTICES:,} vertices / {ne:,} edges ({ne * PR_ITERS:,} edge-traversals):

| engine | sec | edge-traversals/sec |
|---|---|---|
{row("pure-Python power iteration (reference model)", ref_pr_sec, ne * PR_ITERS)}
{row("this engine, local[2]", legs[0]["pr_sec"], ne * PR_ITERS)}
{row("this engine, local[32]", legs[1]["pr_sec"], ne * PR_ITERS)}

{PR_BIG_VERTICES:,} vertices / {nbig:,} edges ({nbig * PR_ITERS:,} edge-traversals):

| engine | sec | edge-traversals/sec |
|---|---|---|
{row("pure-Python power iteration (reference model)", ref_pr_big_sec, nbig * PR_ITERS)}
{row("this engine, local[2]", big_legs[0]["pr_sec"], nbig * PR_ITERS)}
{row("this engine, local[32]", big_legs[1]["pr_sec"], nbig * PR_ITERS)}

The small PageRank scale is the worst case for a distributed engine —
per-round fixed cost (stage barriers, materialization) dominates ~20ms
of actual math, which is why the engine unrolls several power
iterations into one plan there (`operators/pagerank.py` `unroll`).  One
scale up, the fixed cost amortizes and the gap inverts; at the 20M-edge
bench scale the engine sustains 11.8M edge-traversals/sec vs 615k/s for
the single-node model (BENCH/BASELINE.md).  Spark legs include full
engine overhead (plan compile, shuffle, checkpoint) and were timed on
a SECOND run after one warm run (the single-node legs have no JIT to
warm).  Raw JSON: `BENCH/reference_compare.json`.  Reproduce:
`python scripts/reference_compare.py`.
"""
    with open("BENCH/REFERENCE.md", "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
