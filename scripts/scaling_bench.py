"""Two-parallelism-level scaling evidence (BASELINE.md plan).

No real multi-executor cluster exists in this sandbox, so the north
rule's N -> 4N criterion is evidenced by running the SAME jobs on the
SAME deterministic input at ``local[2]`` (N) and ``local[8]`` (4N =
4x cores), identical configs otherwise (shuffle partitions fixed at 64
for both so the physical work is identical), and reporting

    scaling_efficiency = (throughput_4N / throughput_N) / 4

per workload.  A ``local[32]`` leg is reported as well for absolute
single-box throughput, but it is NOT the efficiency pair: beyond ~8-16
threads a single JVM serializes on shuffle-file and allocator paths
that a real multi-executor cluster (separate JVMs, separate disks,
separate memory pools) does not share, so local-mode threads stop
being a faithful stand-in for executors there.

This box's throughput also swings ~2x over minutes (shared tenancy),
so the legs are run INTERLEAVED (N, 4N, N, 4N) and each leg's best
trial is used — a noise spike then cannot silently inflate one side of
the ratio.

Usage:
  python scripts/scaling_bench.py            # all legs + report
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
PR_VERTICES = 500_000
PR_EDGES = 10_000_000
MOTIF_VERTICES = 1_500_000
MOTIF_EDGES = 6_000_000
N_LEG = 2
N4_LEG = 8
TRIALS = 2


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


def _subprocess_leg(cpus: int) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--leg", str(cpus)],
        capture_output=True,
        text=True,
        check=False,
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("LEGJSON:")]
    if not line:
        print(proc.stdout[-2000:])
        print(proc.stderr[-2000:])
        raise SystemExit(f"leg {cpus} failed")
    return json.loads(line[0][len("LEGJSON:"):])


def _best(trials: list[dict]) -> dict:
    """Per-metric best across trials (max throughput / min wall)."""
    out = dict(trials[0])
    for t in trials[1:]:
        for k in ("pagerank_tput", "motif_tput"):
            if t[k] > out[k]:
                out[k] = t[k]
                sec = k.replace("_tput", "_sec")
                out[sec] = t[sec]
    return out


def main() -> None:
    if "--leg" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--leg") + 1])
        print("LEGJSON:" + json.dumps(run_leg(cpus)))
        return

    trials: dict[int, list[dict]] = {N_LEG: [], N4_LEG: []}
    for t in range(TRIALS):
        for cpus in (N_LEG, N4_LEG):
            leg = _subprocess_leg(cpus)
            trials[cpus].append(leg)
            print(json.dumps(leg), flush=True)
    legs = {c: _best(ts) for c, ts in trials.items()}
    leg32 = _subprocess_leg(32)
    print(json.dumps(leg32), flush=True)

    eff_pr = legs[N4_LEG]["pagerank_tput"] / legs[N_LEG]["pagerank_tput"] / 4
    eff_mo = legs[N4_LEG]["motif_tput"] / legs[N_LEG]["motif_tput"] / 4
    report = {
        "N_cpus": N_LEG,
        "4N_cpus": N4_LEG,
        "trials": trials,
        "localN": legs[N_LEG],
        "local4N": legs[N4_LEG],
        "local32": leg32,
        "pagerank_scaling_efficiency": round(eff_pr, 3),
        "motif_scaling_efficiency": round(eff_mo, 3),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling.json", "w") as f:
        json.dump(report, f, indent=1)

    md = f"""# BENCH/BASELINE.md — measured throughput + scaling evidence

Sandbox stand-in for the north rule's N -> 4N executor criterion
(BASELINE.md): identical jobs, identical deterministic inputs, identical
configs (64 shuffle partitions), at `local[{N_LEG}]` (N) vs
`local[{N4_LEG}]` (4N).  Legs are interleaved (N, 4N, N, 4N) and each
side's best trial is used because this shared box's throughput swings
~2x over minutes; a `local[32]` leg is reported for absolute
throughput but is not the efficiency pair (beyond ~8-16 threads a
single JVM serializes on shuffle/allocator paths that distinct
executor JVMs on a real cluster do not share).

## PageRank ({PR_ITERS} fixed iterations, {legs[N_LEG]['pr_edges']:,} edges, JVM scatter kernel)

| leg | wall sec | edge-traversals/sec |
|---|---|---|
| local[{N_LEG}] (N)  | {legs[N_LEG]['pagerank_sec']} | {legs[N_LEG]['pagerank_tput']:,} |
| local[{N4_LEG}] (4N) | {legs[N4_LEG]['pagerank_sec']} | {legs[N4_LEG]['pagerank_tput']:,} |
| local[32] | {leg32['pagerank_sec']} | {leg32['pagerank_tput']:,} |

**scaling efficiency (N->4N) = {eff_pr:.3f}** (target >= 0.8)

## Motif search (directed 2-path monomorphisms, {legs[N_LEG]['motif_edges']:,} edges)

| leg | wall sec | matches | matches/sec |
|---|---|---|---|
| local[{N_LEG}] (N)  | {legs[N_LEG]['motif_sec']} | {legs[N_LEG]['motif_matches']:,} | {legs[N_LEG]['motif_tput']:,} |
| local[{N4_LEG}] (4N) | {legs[N4_LEG]['motif_sec']} | {legs[N4_LEG]['motif_matches']:,} | {legs[N4_LEG]['motif_tput']:,} |
| local[32] | {leg32['motif_sec']} | {leg32['motif_matches']:,} | {leg32['motif_tput']:,} |

**scaling efficiency (N->4N) = {eff_mo:.3f}** (target >= 0.8)

Raw JSON: `BENCH/scaling.json`. Reproduce: `python scripts/scaling_bench.py`.
"""
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
