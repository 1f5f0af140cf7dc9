"""BFS levels vs networkx single_source_shortest_path_length."""

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.bfs import bfs_levels


def _edges_df(spark, g):
    rows = [(str(u), str(v)) for u, v in g.edges()]
    return spark.createDataFrame(rows, "src string, dst string").distinct()


def _got(spark, g, source, **kw):
    return {
        r.id: r.dist for r in bfs_levels(_edges_df(spark, g), source, **kw).collect()
    }


class TestBfsLevels:
    def test_karate(self, spark):
        g = nx.karate_club_graph()
        want = {str(k): v for k, v in nx.single_source_shortest_path_length(g, 0).items()}
        assert _got(spark, g, "0") == want

    def test_unreachable_absent(self, spark):
        g = nx.union(nx.path_graph(4), nx.path_graph(3), rename=("a", "b"))
        got = _got(spark, g, "a0")
        assert set(got) == {"a0", "a1", "a2", "a3"}
        assert got == {"a0": 0, "a1": 1, "a2": 2, "a3": 3}

    def test_directed(self, spark):
        g = nx.DiGraph([(0, 1), (1, 2), (2, 0), (3, 0)])
        got = _got(spark, g, "0", directed=True)
        want = {
            str(k): v for k, v in nx.single_source_shortest_path_length(g, 0).items()
        }
        assert got == want  # 3 unreachable following orientation
        assert "3" not in got

    def test_cycle_terminates(self, spark):
        g = nx.cycle_graph(7)
        want = {str(k): v for k, v in nx.single_source_shortest_path_length(g, 2).items()}
        assert _got(spark, g, "2") == want

    def test_max_depth_guard(self, spark):
        g = nx.path_graph(6)
        with pytest.raises(RuntimeError):
            bfs_levels(_edges_df(spark, g), "0", max_depth=2).collect()
