"""Per-loop driver-job gates for the remaining iterative operators
(VERDICT r2 item 7): HyperBall's neighborhood function, DAG longest
path, and densest subgraph each fold their per-round scalars into ONE
combined agg beside the round's single materialization.  Budgets are
pinned on fixed seeded graphs — a collect creeping back into any loop
body adds +rounds jobs and trips the bound.

Uses the shared counter in tests/jobgate.py.
"""

import networkx as nx

from tests.jobgate import jobs_during


def _edges(spark, g):
    return spark.createDataFrame(
        [(str(u), str(v)) for u, v in g.edges()], "src string, dst string"
    )


def test_neighborhood_function_two_jobs_per_round(spark):
    from grandiso_networkx_spark.operators.hyperball import (
        neighborhood_function,
    )

    g = nx.gnp_random_graph(24, 0.12, seed=3)
    e = _edges(spark, g)
    out = {}

    def run():
        out["rounds"] = len(neighborhood_function(e, max_rounds=8)) - 1

    jobs = jobs_during(spark, run)
    # initial checkpoint + initial estimate + (1 checkpoint + 1
    # combined est/convergence agg) per round, +1 for the dropped
    # unchanged-round probe
    assert jobs <= 2 + 2 * (out["rounds"] + 1) + 1, (jobs, out)


def test_longest_path_levels_two_jobs_per_round(spark):
    from grandiso_networkx_spark.operators.dag import longest_path_levels

    dg = nx.gnp_random_graph(20, 0.15, seed=4, directed=True)
    e = spark.createDataFrame(
        [(str(u), str(v)) for u, v in dg.edges() if u < v],
        "src string, dst string",
    )
    rows = None

    def run():
        nonlocal rows
        rows = longest_path_levels(e).collect()

    jobs = jobs_during(spark, run)
    depth = max(r["level"] for r in rows) + 1
    # per executed round: 1 flat_checkpoint + 1 combined (changed,
    # max-level) agg; + setup/teardown slack
    assert jobs <= 2 * (depth + 1) + 5, (jobs, depth)


def test_densest_subgraph_bounded_jobs(spark):
    from grandiso_networkx_spark.operators.kcore import densest_subgraph

    g = nx.gnp_random_graph(24, 0.12, seed=3)
    e = _edges(spark, g)
    jobs = jobs_during(spark, lambda: densest_subgraph(e).collect())
    # measured 10 on this fixed graph: 1 sym checkpoint + per round
    # (1 scalar agg + <=2 frame checkpoints) + final collect.  A new
    # per-round collect would add +rounds.
    assert jobs <= 14, jobs
