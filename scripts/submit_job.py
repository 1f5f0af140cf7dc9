"""Cluster job entry point for the link-graph engine.

Run via spark-submit with the packaged engine shipped to executors::

    scripts/make_pyfiles.sh
    spark-submit --py-files dist/grandiso_networkx_spark.zip \\
        scripts/submit_job.py \\
        --transcripts /path/to/transcripts_parquet_or_iceberg \\
        --op pagerank --output /path/out --checkpoint-dir /path/ckpt

This file deliberately does NOT set ``master`` or local-mode tunings:
the cluster manager (YARN/k8s/standalone) owns executor topology, and
the engine code itself is partitioning-explicit, so the same script is
what the north rule's N- and 4N-executor runs submit.  The sandbox
scaling evidence (`scripts/scaling_bench.py`) runs the same operators
with ``local[N]`` masters instead.

Ops:
  derive      transcripts -> (src, dst, etype, weight) edge table
  pagerank    per-vertex PageRank over the derived (or raw) edges
  components  connected components (HashMin)
  lpa         synchronous min-tie-break label propagation
  triangles   per-vertex + total triangle counts
  motif       motif match count, motif given as 'A>B,B>C' edge list

Input: either ``--transcripts`` (parquet path or Iceberg table name
with ``--format iceberg``) with columns
``(conv_id, turn_idx, role, text, tool, ts)``, or ``--synth-convs N``
for the deterministic synthetic table (smoke tests).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession, functions as F


def build_session(app: str) -> SparkSession:
    # Cluster-neutral engine confs only; master/executors come from
    # spark-submit.  AQE handles runtime frontier-size swings; Arrow is
    # required by the vectorized kernels.
    return (
        SparkSession.builder.appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def load_transcripts(spark: SparkSession, args) -> "DataFrame":
    if args.transcripts:
        from grandiso_networkx_spark.sources.tables import read_transcripts

        return read_transcripts(spark, args.transcripts, fmt=args.format)
    from grandiso_networkx_spark.sources.transcripts import synth_transcripts

    return synth_transcripts(spark, n_convs=args.synth_convs)


def parse_motif(spec: str, directed: bool):
    from grandiso_networkx_spark.plans.motif import Motif

    m = Motif(directed=directed)
    for part in spec.split(","):
        u, v = part.split(">")
        m.add_edge(u.strip(), v.strip())
    return m


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--op", required=True,
                   choices=["derive", "pagerank", "components", "lpa",
                            "triangles", "motif"])
    p.add_argument("--transcripts", default=None,
                   help="parquet path / iceberg table of transcripts")
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "iceberg"])
    p.add_argument("--synth-convs", type=int, default=1000,
                   help="synthesize this many conversations when no "
                        "--transcripts is given")
    p.add_argument("--edges", default=None,
                   help="optional pre-derived edge parquet (src,dst[,weight]) "
                        "— skips stage-0 derivation")
    p.add_argument("--output", required=True, help="output parquet path")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--motif-spec", default="A>B,B>C",
                   help="motif edges as 'A>B,B>C'")
    p.add_argument("--alpha", type=float, default=0.85)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--undirected", action="store_true")
    args = p.parse_args(argv)

    spark = build_session(f"grandiso-spark:{args.op}")
    t0 = time.time()

    from grandiso_networkx_spark.checkpoint import CheckpointManager
    from grandiso_networkx_spark.operators.derive import derive_edges, derive_host_graph

    ckpt = (
        CheckpointManager(spark, args.checkpoint_dir, job=args.op)
        if args.checkpoint_dir
        else None
    )

    if args.edges:
        edges = spark.read.parquet(args.edges)
    else:
        transcripts = load_transcripts(spark, args)
        edges = derive_edges(transcripts)

    if args.op == "derive":
        out = edges
    elif args.op == "pagerank":
        from grandiso_networkx_spark.operators.pagerank import pagerank

        e = edges.select("src", "dst")
        if args.undirected:
            e = e.unionAll(e.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
            e = e.dropDuplicates(["src", "dst"])
        out = pagerank(e, alpha=args.alpha, tol=args.tol,
                       max_iter=args.max_iter, checkpoint=ckpt)
    elif args.op == "components":
        from grandiso_networkx_spark.operators.components import connected_components

        out = connected_components(edges.select("src", "dst"), checkpoint=ckpt)
    elif args.op == "lpa":
        from grandiso_networkx_spark.operators.label_propagation import label_propagation

        out = label_propagation(edges.select("src", "dst"), checkpoint=ckpt)
    elif args.op == "triangles":
        from grandiso_networkx_spark.operators.triangles import per_vertex_triangles

        out = per_vertex_triangles(edges.select("src", "dst"))
    elif args.op == "motif":
        from grandiso_networkx_spark.operators.match import find_motifs_df

        if args.edges:
            from grandiso_networkx_spark.graph import HostGraph

            host = HostGraph(edges.select("src", "dst"),
                             directed=not args.undirected)
        else:
            transcripts = load_transcripts(spark, args)
            host = derive_host_graph(transcripts,
                                     directed=not args.undirected)
        motif = parse_motif(args.motif_spec, directed=not args.undirected)
        out = find_motifs_df(motif, host)

    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({
        "op": args.op,
        "output": args.output,
        "rows": n,
        "wall_sec": round(time.time() - t0, 2),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
