"""Two-parallelism-level scaling evidence (BASELINE.md plan).

No real multi-executor cluster exists in this sandbox, so the north
rule's N → 4N criterion is evidenced by running the SAME jobs on the
SAME deterministic input at ``local[8]`` and ``local[32]`` (4× cores),
identical configs otherwise (shuffle partitions fixed at 64 for both so
the physical work is identical), and reporting

    scaling_efficiency = (throughput_local32 / throughput_local8) / 4

per workload.  Workloads are sized so the local[8] leg runs ≥ 60 s
(amortizing fixed JVM/stage overheads, per BASELINE.md).

Usage:
  python scripts/scaling_bench.py            # both legs + report
  python scripts/scaling_bench.py --leg 8    # one leg, prints JSON
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PR_ITERS = 8
PR_VERTICES = 1_000_000
PR_EDGES = 20_000_000
MOTIF_VERTICES = 1_500_000
MOTIF_EDGES = 6_000_000


def run_leg(cpus: int) -> dict:
    from pyspark.sql import functions as F

    import bench
    from grandiso_networkx_spark.graph import HostGraph
    from grandiso_networkx_spark.operators.match import find_motifs_df
    from grandiso_networkx_spark.operators.pagerank import pagerank
    from grandiso_networkx_spark.plans.motif import Motif
    from grandiso_networkx_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=64,
    )
    out: dict = {"cpus": cpus}

    g = bench.powerlaw_graph(spark, PR_VERTICES, PR_EDGES).persist()
    n_edges = g.count()
    out["pr_edges"] = n_edges
    t0 = time.time()
    pagerank(g, fixed_iterations=PR_ITERS).agg(F.sum("rank")).collect()
    out["pagerank_sec"] = round(time.time() - t0, 2)
    out["pagerank_tput"] = round(n_edges * PR_ITERS / out["pagerank_sec"], 1)
    g.unpersist()

    gm = bench.powerlaw_graph(spark, MOTIF_VERTICES, MOTIF_EDGES, seed=7).persist()
    m_edges = gm.count()
    out["motif_edges"] = m_edges
    host = HostGraph(gm, directed=True)
    m = Motif(directed=True)
    m.add_edge("A", "B")
    m.add_edge("B", "C")
    t0 = time.time()
    out["motif_matches"] = find_motifs_df(m, host).count()
    out["motif_sec"] = round(time.time() - t0, 2)
    out["motif_tput"] = round(out["motif_matches"] / out["motif_sec"], 1)

    spark.stop()
    return out


def main() -> None:
    if "--leg" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--leg") + 1])
        print("LEGJSON:" + json.dumps(run_leg(cpus)))
        return

    legs = {}
    for cpus in (8, 32):
        env = dict(os.environ)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", str(cpus)],
            capture_output=True,
            text=True,
            env=env,
            check=False,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("LEGJSON:")]
        if not line:
            print(proc.stdout[-2000:])
            print(proc.stderr[-2000:])
            raise SystemExit(f"leg {cpus} failed")
        legs[cpus] = json.loads(line[0][len("LEGJSON:"):])
        print(json.dumps(legs[cpus]))

    eff_pr = legs[32]["pagerank_tput"] / legs[8]["pagerank_tput"] / 4
    eff_mo = legs[32]["motif_tput"] / legs[8]["motif_tput"] / 4
    report = {
        "local8": legs[8],
        "local32": legs[32],
        "pagerank_scaling_efficiency": round(eff_pr, 3),
        "motif_scaling_efficiency": round(eff_mo, 3),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling.json", "w") as f:
        json.dump(report, f, indent=1)

    md = f"""# BENCH/BASELINE.md — measured throughput + scaling evidence

Sandbox stand-in for the north rule's N → 4N executor criterion
(BASELINE.md): identical jobs, identical deterministic inputs, identical
configs (64 shuffle partitions), at `local[8]` vs `local[32]`.

## PageRank ({PR_ITERS} fixed iterations, {legs[8]['pr_edges']:,} edges, JVM scatter kernel)

| leg | wall sec | edge-traversals/sec |
|---|---|---|
| local[8]  | {legs[8]['pagerank_sec']} | {legs[8]['pagerank_tput']:,} |
| local[32] | {legs[32]['pagerank_sec']} | {legs[32]['pagerank_tput']:,} |

**scaling efficiency = {eff_pr:.3f}** (target ≥ 0.8)

## Motif search (directed 2-path monomorphisms, {legs[8]['motif_edges']:,} edges)

| leg | wall sec | matches | matches/sec |
|---|---|---|---|
| local[8]  | {legs[8]['motif_sec']} | {legs[8]['motif_matches']:,} | {legs[8]['motif_tput']:,} |
| local[32] | {legs[32]['motif_sec']} | {legs[32]['motif_matches']:,} | {legs[32]['motif_tput']:,} |

**scaling efficiency = {eff_mo:.3f}** (target ≥ 0.8)

Raw JSON: `BENCH/scaling.json`. Reproduce: `python scripts/scaling_bench.py`.
"""
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
