"""Per-round driver-job gates for the eigenvector/Katz gather loops
(VERDICT r2 finding #3: both ran 2 scalar driver jobs per round where
HITS folds the carried scalar into one combined agg).

Budgets (counting Spark jobs = materializations + collects alike):

- eigenvector convergence: 1 localCheckpoint + 1 combined (norm, L1)
  agg per round; fixed: 1 localCheckpoint only (the per-round norm is
  an in-plan broadcast subquery).
- katz convergence: 1 localCheckpoint + 1 L1 agg over the
  just-materialized frame (xlast carried — no re-join); fixed:
  1 localCheckpoint only.
"""

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.eigenvector import (
    eigenvector_centrality,
)
from grandiso_networkx_spark.operators.katz import katz_centrality
from tests.jobgate import jobs_during as _jobs_during


def _edges(spark):
    g = nx.DiGraph([(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 0)])
    return spark.createDataFrame(
        [(str(u), str(v)) for u, v in g.edges()], "src string, dst string"
    )


@pytest.mark.parametrize("op,mode,budget_per_round,rounds", [
    # eigenvector fixed: 1 localCheckpoint + the in-plan broadcast
    # norm subquery (1 broadcast-collect job) — no separate driver
    # collect, but the broadcast materialization is still a job.
    (eigenvector_centrality, "fixed", 2, 12),
    (eigenvector_centrality, "converge", 2, 60),
    (katz_centrality, "fixed", 1, 12),
    (katz_centrality, "converge", 2, 60),
])
def test_per_round_job_count(spark, op, mode, budget_per_round, rounds):
    e = _edges(spark)
    if mode == "fixed":
        run = lambda: op(e, fixed_iterations=rounds).collect()
    else:
        # rounds = generous upper bound on rounds-to-converge
        run = lambda: op(e, max_iter=200, tol=1e-9).collect()
    jobs = _jobs_during(spark, run)
    # One-time jobs outside the loop: verts.count, initial checkpoint,
    # final normalization agg + the caller's collect -> <= 6.
    assert jobs <= budget_per_round * rounds + 6, jobs


def test_results_unchanged_vs_networkx(spark):
    """The job-count refactor must not move any value: convergence-mode
    outputs still match networkx allclose."""
    import math

    g = nx.DiGraph([(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 0)])
    e = _edges(spark)
    got_e = {
        r["id"]: r["eigenvector"]
        for r in eigenvector_centrality(e, max_iter=500, tol=1e-10).collect()
    }
    want_e = nx.eigenvector_centrality(g, max_iter=500, tol=1e-10)
    for k, v in want_e.items():
        assert math.isclose(got_e[str(k)], v, abs_tol=1e-6), (k, v)
    got_k = {
        r["id"]: r["katz"] for r in katz_centrality(e, tol=1e-10).collect()
    }
    want_k = nx.katz_centrality(g, tol=1e-10)
    for k, v in want_k.items():
        assert math.isclose(got_k[str(k)], v, abs_tol=1e-6), (k, v)
