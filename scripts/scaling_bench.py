"""Two-parallelism-level scaling evidence (BASELINE.md plan).

No real multi-executor cluster exists in this sandbox, so the north
rule's N -> 4N criterion is evidenced by running the SAME jobs on the
SAME deterministic input at ``local[2]`` (N) and ``local[8]`` (4N =
4x cores), identical configs otherwise (shuffle partitions fixed at 64
for both so the physical work is identical), and reporting

    scaling_efficiency = (throughput_4N / throughput_N) / 4

per workload.

Measurement design — this box's throughput swings 3-4x on a minutes
timescale (shared tenancy; the identical command measured 42s and
112s two minutes apart), so sequential legs are meaningless. Instead:

- **Paired-concurrent legs.** Each trial runs the N leg and the 4N leg
  AT THE SAME TIME, pinned (``taskset``) to disjoint core sets (2 + 8
  of the box's 32 — no mutual contention). Both legs therefore see the
  same external-noise window, and the ratio cancels it. This is also
  the closest local-mode analogue of two independent clusters.
- **Steady-state timing.** JVM startup, input generation, adjacency
  build, and first-iteration cache warming are excluded: each leg
  builds + warms first, then times the measured phase only (PageRank:
  ``PR_WARM`` untimed iterations then ``PR_ITERS`` timed; motif: one
  untimed single-edge warm query, then the timed 2-path count).
- **Median of per-pair efficiencies** across ``TRIALS`` pairs; all raw
  trials are reported in BENCH/scaling.json.

A ``local[32]`` leg is reported as well for absolute single-box
throughput, but it is NOT the efficiency pair: beyond ~8-16 threads a
single JVM serializes on shuffle-file and allocator paths that a real
multi-executor cluster (separate JVMs, separate disks, separate memory
pools) does not share.

Usage:
  python scripts/scaling_bench.py                # full run + report
  python scripts/scaling_bench.py --leg 8        # one leg, prints JSON
  python scripts/scaling_bench.py --leg 8 --cores 8-15
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PR_ITERS = 8
PR_WARM = 2
PR_VERTICES = 500_000
PR_EDGES = 10_000_000
MOTIF_VERTICES = 1_500_000
MOTIF_EDGES = 6_000_000
N_LEG = 2
N4_LEG = 8
TRIALS = 3
# Disjoint pinned core sets: N on 0-1, 4N on 8-15 (leaves 2-7 and
# 16-31 for OS/noise so the pinned sets stay comparatively clean).
CORES = {N_LEG: "0-1", N4_LEG: "8-15", 32: "0-31"}


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
    # Warm: JIT, shuffle paths, cached input. Timed: PR_ITERS fixed
    # iterations (each pays the full scatter/gather/update pipeline —
    # adjacency build happens inside both runs and is warm for the
    # second by OS/cache effects only, so the timed run still includes
    # one blocks build; subtract it by timing a 0-extra-work baseline).
    pagerank(g, fixed_iterations=PR_WARM).agg(F.sum("rank")).collect()
    t0 = time.time()
    pagerank(g, fixed_iterations=PR_WARM).agg(F.sum("rank")).collect()
    t_base = time.time() - t0
    t0 = time.time()
    pagerank(g, fixed_iterations=PR_WARM + PR_ITERS).agg(F.sum("rank")).collect()
    t_full = time.time() - t0
    # Marginal cost of PR_ITERS steady-state iterations.
    out["pagerank_sec"] = round(max(t_full - t_base, 1e-3), 2)
    out["pagerank_tput"] = round(n_edges * PR_ITERS / out["pagerank_sec"], 1)
    g.unpersist()

    gm = bench.powerlaw_graph(spark, MOTIF_VERTICES, MOTIF_EDGES, seed=7).persist()
    m_edges = gm.count()
    out["motif_edges"] = m_edges
    host = HostGraph(gm, directed=True)
    warm = Motif(directed=True)
    warm.add_edge("A", "B")
    find_motifs_df(warm, host).count()  # warm: degree tables, caches, JIT
    m = Motif(directed=True)
    m.add_edge("A", "B")
    m.add_edge("B", "C")
    t0 = time.time()
    out["motif_matches"] = find_motifs_df(m, host).count()
    out["motif_sec"] = round(time.time() - t0, 2)
    out["motif_tput"] = round(out["motif_matches"] / out["motif_sec"], 1)

    spark.stop()
    return out


def _spawn_leg(cpus: int) -> subprocess.Popen:
    cmd = [sys.executable, os.path.abspath(__file__), "--leg", str(cpus)]
    cores = CORES.get(cpus)
    if cores:
        cmd = ["taskset", "-c", cores] + cmd
    return subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True
    )


def _collect(proc: subprocess.Popen, cpus: int) -> dict:
    stdout, stderr = proc.communicate()
    line = [l for l in stdout.splitlines() if l.startswith("LEGJSON:")]
    if not line:
        print(stdout[-2000:])
        print(stderr[-2000:])
        raise SystemExit(f"leg {cpus} failed")
    return json.loads(line[0][len("LEGJSON:"):])


def main() -> None:
    if "--leg" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--leg") + 1])
        print("LEGJSON:" + json.dumps(run_leg(cpus)))
        return

    pairs: list[dict] = []
    for t in range(TRIALS):
        pn = _spawn_leg(N_LEG)
        p4 = _spawn_leg(N4_LEG)
        legN = _collect(pn, N_LEG)
        leg4 = _collect(p4, N4_LEG)
        pair = {
            "trial": t,
            "N": legN,
            "4N": leg4,
            "pagerank_eff": round(
                leg4["pagerank_tput"] / legN["pagerank_tput"] / 4, 3
            ),
            "motif_eff": round(leg4["motif_tput"] / legN["motif_tput"] / 4, 3),
        }
        pairs.append(pair)
        print(json.dumps(pair), flush=True)

    leg32 = _collect(_spawn_leg(32), 32)
    print(json.dumps(leg32), flush=True)

    eff_pr = statistics.median(p["pagerank_eff"] for p in pairs)
    eff_mo = statistics.median(p["motif_eff"] for p in pairs)
    med_pr = statistics.median(p["4N"]["pagerank_tput"] for p in pairs)
    med_mo = statistics.median(p["4N"]["motif_tput"] for p in pairs)
    medN_pr = statistics.median(p["N"]["pagerank_tput"] for p in pairs)
    medN_mo = statistics.median(p["N"]["motif_tput"] for p in pairs)
    report = {
        "N_cpus": N_LEG,
        "4N_cpus": N4_LEG,
        "pairs": pairs,
        "local32": leg32,
        "median_N_pagerank_tput": medN_pr,
        "median_4N_pagerank_tput": med_pr,
        "median_N_motif_tput": medN_mo,
        "median_4N_motif_tput": med_mo,
        "pagerank_scaling_efficiency": round(eff_pr, 3),
        "motif_scaling_efficiency": round(eff_mo, 3),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling.json", "w") as f:
        json.dump(report, f, indent=1)

    rows_pr = "\n".join(
        f"| {p['trial']} | {p['N']['pagerank_sec']} | {p['N']['pagerank_tput']:,} "
        f"| {p['4N']['pagerank_sec']} | {p['4N']['pagerank_tput']:,} "
        f"| {p['pagerank_eff']} |"
        for p in pairs
    )
    rows_mo = "\n".join(
        f"| {p['trial']} | {p['N']['motif_sec']} | {p['N']['motif_tput']:,} "
        f"| {p['4N']['motif_sec']} | {p['4N']['motif_tput']:,} "
        f"| {p['motif_eff']} |"
        for p in pairs
    )
    md = f"""# BENCH/BASELINE.md — measured throughput + scaling evidence

Sandbox stand-in for the north rule's N -> 4N executor criterion
(BASELINE.md): identical jobs, identical deterministic inputs,
identical configs (64 shuffle partitions), at `local[{N_LEG}]` (N) vs
`local[{N4_LEG}]` (4N). This box's throughput swings 3-4x on a minutes
timescale (shared tenancy), so each trial runs BOTH legs concurrently
on disjoint `taskset`-pinned core sets ({CORES[N_LEG]} vs
{CORES[N4_LEG]} of 32) — both legs share the same noise window and the
ratio cancels it — and timing is steady-state (JVM startup, input
generation, adjacency build, and warm-up iterations excluded).
Efficiency = median over {TRIALS} paired trials of
`(tput_4N / tput_N) / 4`. A `local[32]` leg is reported for absolute
throughput but is not the efficiency pair (beyond ~8-16 threads a
single JVM serializes on shuffle/allocator paths that distinct
executor JVMs on a real cluster do not share).

## PageRank ({PR_ITERS} timed steady-state iterations after {PR_WARM} warm-up, {pairs[0]['N']['pr_edges']:,} edges, JVM scatter kernel)

| trial | N sec | N tput | 4N sec | 4N tput | efficiency |
|---|---|---|---|---|---|
{rows_pr}

**median scaling efficiency (N->4N) = {eff_pr:.3f}** (target >= 0.8);
tput = edge-traversals/sec. local[32]: {leg32['pagerank_sec']}s,
{leg32['pagerank_tput']:,}/s.

## Motif search (directed 2-path monomorphisms, {pairs[0]['N']['motif_edges']:,} edges, {pairs[0]['N']['motif_matches']:,} matches)

| trial | N sec | N tput | 4N sec | 4N tput | efficiency |
|---|---|---|---|---|---|
{rows_mo}

**median scaling efficiency (N->4N) = {eff_mo:.3f}** (target >= 0.8);
tput = matches/sec. local[32]: {leg32['motif_sec']}s,
{leg32['motif_tput']:,}/s.

Raw JSON: `BENCH/scaling.json`. Reproduce: `python scripts/scaling_bench.py`.
"""
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
