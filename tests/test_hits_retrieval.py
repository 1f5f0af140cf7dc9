"""HITS vs networkx oracle; BM25 / TF-IDF vs pure-python oracles."""

import math

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.hits import hits
from grandiso_networkx_spark.operators.retrieval import bm25_topk, tfidf_terms


# ---------------------------------------------------------------- HITS


def _nx_hits(g, **kw):
    from tests.oracles import hits_oracle

    return hits_oracle([(str(u), str(v), 1.0) for u, v in g.edges()], **kw)


def _hits_df(spark, g, **kw):
    rows = [(str(u), str(v)) for u, v in g.edges()]
    e = spark.createDataFrame(rows, "src string, dst string")
    return {
        r["id"]: (r["hub"], r["authority"]) for r in hits(e, **kw).collect()
    }


@pytest.mark.parametrize("seed", [1, 7, 13])
def test_hits_matches_networkx_random(spark, seed):
    g = nx.fast_gnp_random_graph(12, 0.35, seed=seed, directed=True)
    if g.number_of_edges() == 0:
        pytest.skip("empty graph draw")
    want_h, want_a = _nx_hits(g, max_iter=1000, tol=1e-12)
    got = _hits_df(spark, g, max_iter=1000, tol=1e-12)
    assert set(got) == {str(n) for n in g if g.degree(n) > 0}
    for k, (h, a) in got.items():
        assert math.isclose(h, want_h[k], abs_tol=1e-6), (k, h, want_h[k])
        assert math.isclose(a, want_a[k], abs_tol=1e-6), (k, a, want_a[k])


def test_hits_fixed_iterations(spark):
    g = nx.DiGraph([(0, 1), (0, 2), (1, 2), (2, 0)])
    got = _hits_df(spark, g, fixed_iterations=30)
    want_h, want_a = _nx_hits(g, max_iter=1000, tol=1e-12)
    for k, (h, a) in got.items():
        assert math.isclose(h, want_h[k], abs_tol=1e-4)
        assert math.isclose(a, want_a[k], abs_tol=1e-4)


def test_hits_not_converged_raises(spark):
    g = nx.DiGraph([(0, 1), (1, 0), (0, 2)])
    with pytest.raises(RuntimeError):
        hits(
            spark.createDataFrame(
                [(str(u), str(v)) for u, v in g.edges()],
                "src string, dst string",
            ),
            max_iter=1,
            tol=1e-30,
        )


def _jobs_during(spark, fn):
    """Run fn under a job group; return the number of Spark jobs it
    submitted from this thread (materializations + collects alike)."""
    sc = spark.sparkContext
    group = "job-count-gate"
    sc.setJobGroup(group, "counting")
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
    return len(sc.statusTracker().getJobIdsForGroup(group))


@pytest.mark.parametrize("mode,budget_per_round,fixed", [
    # fixed mode: 2 localCheckpoints per round, ZERO per-round collects.
    ("fixed", 2, 12),
    # convergence mode: 2 localCheckpoints + ONE combined (max, L1) agg.
    ("converge", 3, None),
])
def test_hits_per_round_job_count(spark, mode, budget_per_round, fixed):
    """Serial-fraction gate: the loop body must stay at <= 2
    materializations (+1 combined agg in convergence mode) per round —
    the a-max / h-max / err collects may NOT creep back in as separate
    driver jobs (VERDICT r1 finding #4)."""
    g = nx.DiGraph([(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 0)])
    e = spark.createDataFrame(
        [(str(u), str(v)) for u, v in g.edges()], "src string, dst string"
    )
    if mode == "fixed":
        rounds = fixed
        run = lambda: hits(e, fixed_iterations=fixed).collect()
    else:
        rounds = 40  # generous upper bound on rounds-to-converge
        run = lambda: hits(e, max_iter=200, tol=1e-10).collect()
    jobs = _jobs_during(spark, run)
    # One-time jobs outside the loop: verts.count, initial h checkpoint,
    # final a-max (+h-max in fixed mode), normalization sums, output
    # checkpoint + the caller's collect -> <= 8.
    assert jobs <= budget_per_round * rounds + 8, jobs


def test_hits_weighted_matches_networkx(spark):
    from tests.oracles import hits_oracle

    wedges = [("0", "1", 2.0), ("0", "2", 0.5), ("1", "2", 3.0), ("2", "0", 1.0)]
    want_h, want_a = hits_oracle(wedges, max_iter=2000, tol=1e-12)
    e = spark.createDataFrame(
        wedges, "src string, dst string, weight double"
    )
    got = {
        r["id"]: (r["hub"], r["authority"])
        for r in hits(e, max_iter=2000, tol=1e-12, weight_col="weight").collect()
    }
    for k, (h, a) in got.items():
        assert math.isclose(h, want_h[k], abs_tol=1e-6), (k, h, want_h[k])
        assert math.isclose(a, want_a[k], abs_tol=1e-6), (k, a, want_a[k])


# ------------------------------------------------------- BM25 / TF-IDF

DOCS = [
    (0, "spark window merge window window"),
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "spark spark spark batch stream"),
    (3, "merge sort merge join window"),
    (4, ""),
    (5, "window"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_tokens(text):
    import re

    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ")]


def _py_bm25(query, k1=1.2, b=0.75):
    toks = {d: _py_tokens(t) for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    tf = {}
    for d, ts in toks.items():
        for t in ts:
            if t in query:
                tf[(d, t)] = tf.get((d, t), 0) + 1
    df = {}
    for (d, t) in tf:
        df[t] = df.get(t, 0) + 1
    scores = {}
    for (d, t), f in tf.items():
        idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
        dl = len(toks[d])
        w = idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dl / avgdl))
        scores[d] = scores.get(d, 0.0) + w
    return {d: round(s, 6) for d, s in scores.items()}


def test_bm25_matches_python_oracle(spark):
    query = ["spark", "window"]
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(_docs_df(spark), query, k=10).collect()
    }
    want = _py_bm25(set(query))
    assert got == pytest.approx(want)


def test_bm25_topk_cuts_and_orders(spark):
    got = bm25_topk(_docs_df(spark), ["spark", "window", "merge"], k=2).collect()
    assert len(got) == 2
    assert got[0]["score"] >= got[1]["score"]


def test_bm25_empty_query_raises(spark):
    with pytest.raises(ValueError):
        bm25_topk(_docs_df(spark), [])


def test_tfidf_matches_python_oracle(spark):
    got = {
        (r["doc_id"], r["term"]): r["tfidf"]
        for r in tfidf_terms(_docs_df(spark)).collect()
    }
    toks = {d: _py_tokens(t) for d, t in DOCS}
    n = len(DOCS)
    tf = {}
    for d, ts in toks.items():
        for t in ts:
            if t:
                tf[(d, t)] = tf.get((d, t), 0) + 1
    df = {}
    for (d, t) in tf:
        df[t] = df.get(t, 0) + 1
    want = {
        (d, t): round((f / len(toks[d])) * (math.log((1 + n) / (1 + df[t])) + 1), 6)
        for (d, t), f in tf.items()
    }
    assert got == pytest.approx(want)
    assert (4, "") not in got  # empty doc contributes nothing
