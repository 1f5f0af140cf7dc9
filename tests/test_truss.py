"""Full truss decomposition vs a networkx k_truss sweep."""

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.kcore import truss_number


def _nx_trussness(g: nx.Graph) -> dict:
    """truss(e) = max k with e in nx.k_truss(G, k) (>= 2 for every
    edge of the simple graph)."""
    out = {tuple(sorted(e)): 2 for e in g.edges() if e[0] != e[1]}
    k = 3
    sub = nx.k_truss(g, k)
    while sub.number_of_edges() > 0:
        for e in sub.edges():
            out[tuple(sorted(e))] = k
        k += 1
        sub = nx.k_truss(g, k)
    return out


def _edges_df(spark, g):
    return spark.createDataFrame(
        [(str(u), str(v)) for u, v in g.edges()], "src string, dst string"
    )


@pytest.mark.parametrize(
    "g",
    [
        nx.complete_graph(5),
        nx.karate_club_graph(),
        nx.fast_gnp_random_graph(25, 0.25, seed=4),
        nx.barbell_graph(5, 2),
    ],
    ids=["k5", "karate", "gnp25", "barbell"],
)
def test_trussness_matches_networkx(spark, g):
    g = nx.relabel_nodes(g, str)
    got = {
        tuple(sorted((r["src"], r["dst"]))): r["truss"]
        for r in truss_number(_edges_df(spark, g)).collect()
    }
    assert got == _nx_trussness(g)


def test_triangle_free_graph_all_truss_2(spark):
    g = nx.relabel_nodes(nx.cycle_graph(6), str)  # no triangles
    got = truss_number(_edges_df(spark, g)).collect()
    assert len(got) == 6 and all(r["truss"] == 2 for r in got)


def test_ktruss_consistency(spark):
    """k_truss(k) is exactly the edges with trussness >= k."""
    from grandiso_networkx_spark.operators.kcore import k_truss

    g = nx.relabel_nodes(nx.fast_gnp_random_graph(20, 0.3, seed=9), str)
    e = _edges_df(spark, g)
    tn = {
        tuple(sorted((r["src"], r["dst"]))): r["truss"]
        for r in truss_number(e).collect()
    }
    for k in (3, 4):
        via_ktruss = {
            tuple(sorted((r["src"], r["dst"]))) for r in k_truss(e, k).collect()
        }
        assert via_ktruss == {p for p, t in tn.items() if t >= k}
