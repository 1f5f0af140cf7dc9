"""Zipf-hub stress fixture for the motif frontier (VERDICT r4 item 7).

The reference's known failure mode is RAM-bound queue blow-up on
hub-heavy hosts (``/root/reference/README.md:10-12``: the frontier
queue squares through a hub before pruning can cut it).  The
distributed analogue is (a) frontier-ROW growth between rounds and
(b) per-partition skew after the expansion join keys a hot vertex.

This script measures both, on two hosts:

- ``base``: the bench power-law generator (hash^2-folded Zipf-ish dst,
  the everyday skew case), and
- ``hub``: the same graph plus one planted super-hub wired to
  ``hub_frac`` of all vertices in BOTH directions — the hostile star
  case.

For K3 (triangle) and K4 (4-clique) it reports, per expansion round:
frontier rows, partitions, max-partition rows, and skew ratio
(max/mean), captured via CheckpointManager's per-partition lineage
metrics; plus wall time for an uncheckpointed count at AQE on and off
(production runs AQE on — its skew-join split is the first line of
defense; these numbers decide whether expand_step needs its own
salting path).

Usage: python scripts/motif_hub_stress.py [--nv 50000] [--ne 500000]
         [--hub-frac 0.05] [--cpus 16]
Writes one JSON line per (host, motif, mode) to stdout.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from grandiso_networkx_spark.checkpoint import CheckpointManager
from grandiso_networkx_spark.graph import HostGraph
from grandiso_networkx_spark.operators.match import find_motifs_df
from grandiso_networkx_spark.plans.motif import Motif
from grandiso_networkx_spark.session import get_spark


def powerlaw_edges(spark, nv: int, ne: int, seed: int = 42):
    e = spark.range(ne).select(
        (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(nv))).alias("src"),
        F.pmod(
            F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(nv))
            * F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(nv)),
            F.lit(nv),
        ).alias("dst"),
    )
    return e.where(F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"])


def with_super_hub(spark, edges, nv: int, frac: float, hub: int = 0):
    """Wire vertex ``hub`` to ``frac*nv`` vertices, both directions —
    the star host (reference README's RAM-bound case)."""
    k = int(nv * frac)
    spokes = spark.range(1, k + 1).select(F.col("id").alias("v"))
    star = spokes.select(
        F.lit(hub).alias("src"), F.col("v").alias("dst")
    ).unionAll(spokes.select(F.col("v").alias("src"), F.lit(hub).alias("dst")))
    return edges.unionAll(star).dropDuplicates(["src", "dst"])


def motif_k(k: int) -> Motif:
    m = Motif(directed=True)
    names = [chr(ord("A") + i) for i in range(k)]
    for i in range(k):
        for j in range(i + 1, k):
            m.add_edge(names[i], names[j])
    return m


def run_case(
    spark, edges, name: str, k: int, cpus: int, salt: int | None = None,
    salt_threshold: int = 2_000,
) -> dict:
    host = HostGraph(edges, directed=True)
    m = motif_k(k)
    out: dict = {"host": name, "motif": f"K{k}"}
    for aqe in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        t0 = time.time()
        out[f"matches_aqe_{aqe}"] = find_motifs_df(m, host).count()
        out[f"wall_aqe_{aqe}"] = round(time.time() - t0, 2)
        if salt is not None:
            t0 = time.time()
            out[f"matches_salted_aqe_{aqe}"] = find_motifs_df(
                m, host, hub_salt=salt, hub_degree_threshold=salt_threshold
            ).count()
            out[f"wall_salted_aqe_{aqe}"] = round(time.time() - t0, 2)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # metrics pass: per-round frontier rows + per-partition skew
    with tempfile.TemporaryDirectory() as td:
        cp = CheckpointManager(spark, os.path.join(td, "cp"), job=f"{name}-K{k}")
        find_motifs_df(m, host, checkpoint=cp).count()
        out["rounds"] = [
            {
                "round": r["round"],
                "rows": r["rows"],
                "partitions": r["partitions"],
                "max_part": r["max_partition_rows"],
                "skew": round(r["skew_ratio"], 2),
            }
            for r in cp.manifest["rounds"]
        ]
    return out


def main() -> None:
    nv, ne, frac, cpus = 50_000, 500_000, 0.05, 16
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--nv":
            nv = int(args[i + 1])
        if a == "--ne":
            ne = int(args[i + 1])
        if a == "--hub-frac":
            frac = float(args[i + 1])
        if a == "--cpus":
            cpus = int(args[i + 1])
    spark = get_spark(
        app_name="motif-hub-stress",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 16),
    )
    base = powerlaw_edges(spark, nv, ne).persist()
    base.count()
    hub = with_super_hub(spark, base, nv, frac).persist()
    hub.count()
    for name, e in (("base", base), ("hub", hub)):
        for k in (3, 4):
            print(
                json.dumps(
                    run_case(
                        spark, e, name, k, cpus,
                        salt=cpus if name == "hub" else None,
                    )
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
