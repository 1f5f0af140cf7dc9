"""HyperBall FM sketches: register contents are an EXACT deterministic
function of (edge set, seed) — compared bit-for-bit against a pure
python replay of the same md5 arithmetic over true BFS balls; the
derived size estimates are approximate and only sanity-checked."""

import hashlib

import networkx as nx

from grandiso_networkx_spark.operators.hyperball import (
    effective_diameter,
    hyperball,
    neighborhood_function,
)

R = 8
SEED = 42


def _h(u: str, r: int, seed: int = SEED) -> int:
    return int(hashlib.md5(f"{u}|{r}|{seed}".encode()).hexdigest()[:15], 16)


def _lowbit(x: int) -> int:
    return 1 if x == 0 else x & -x


def _oracle_sketches(g: nx.DiGraph, rounds: int) -> dict[str, list[int]]:
    out = {}
    for v in g.nodes():
        ball, frontier = {v}, {v}
        for _ in range(rounds):
            nxt = set()
            for u in frontier:
                nxt |= set(g.successors(u))
            frontier = nxt - ball
            ball |= nxt
        out[v] = [
            _or_all(_lowbit(_h(u, r)) for u in ball) for r in range(R)
        ]
    return out


def _or_all(it) -> int:
    m = 0
    for x in it:
        m |= x
    return m


def _edges_df(spark, g):
    return spark.createDataFrame(
        [(str(u), str(v)) for u, v in g.edges()], "src string, dst string"
    )


class TestSketchExactness:
    def test_fixed_rounds_bit_for_bit(self, spark):
        g = nx.fast_gnp_random_graph(40, 0.06, directed=True, seed=11)
        g = nx.relabel_nodes(g, str)
        # drop self-loops like the operator does
        g.remove_edges_from(nx.selfloop_edges(g))
        df = _edges_df(spark, g)
        # restrict oracle to vertices with at least one edge (operator
        # derives its vertex set from the edge list)
        touched = {u for e in g.edges() for u in e}
        for t in (0, 1, 3):
            got = {
                r["id"]: [r[f"s{i}"] for i in range(R)]
                for r in hyperball(
                    df, rounds=t, num_registers=R, with_estimate=False
                ).collect()
            }
            want = {
                v: s
                for v, s in _oracle_sketches(g, t).items()
                if v in touched
            }
            assert got == want, f"round {t}"

    def test_fixed_point_equals_full_reachability(self, spark):
        g = nx.fast_gnp_random_graph(25, 0.08, directed=True, seed=5)
        g = nx.relabel_nodes(g, str)
        g.remove_edges_from(nx.selfloop_edges(g))
        df = _edges_df(spark, g)
        got = {
            r["id"]: [r[f"s{i}"] for i in range(R)]
            for r in hyperball(
                df, rounds=None, num_registers=R, with_estimate=False
            ).collect()
        }
        touched = {u for e in g.edges() for u in e}
        want = {
            v: s
            for v, s in _oracle_sketches(g, len(g)).items()
            if v in touched
        }
        assert got == want


class TestEstimates:
    def test_neighborhood_function_monotone_and_sane(self, spark):
        # directed path 0->1->...->n-1: N(t) = sum_i min(t+1, n-i) exactly
        n = 80
        g = nx.path_graph(n, create_using=nx.DiGraph)
        g = nx.relabel_nodes(g, str)
        nf = neighborhood_function(
            _edges_df(spark, g), max_rounds=n, num_registers=32
        )
        ests = [e for _, e in nf]
        assert all(b >= a - 1e-9 for a, b in zip(ests, ests[1:]))
        # N(0) = n exactly, but FM overestimates singletons by up to
        # ~2x (documented PCSA small-range bias) — band check only
        assert 0.8 * n < ests[0] < 2.5 * n
        # at the fixed point the mean ball is ~n/2 elements, where the
        # phi-corrected estimate applies: +-(0.78/sqrt(32)) ~ 14% stderr
        exact_full = n * (n + 1) / 2
        assert abs(ests[-1] - exact_full) / exact_full < 0.35

    def test_effective_diameter_path(self, spark):
        n = 80
        g = nx.path_graph(n, create_using=nx.DiGraph)
        g = nx.relabel_nodes(g, str)
        d, nf = effective_diameter(
            _edges_df(spark, g), q=0.9, max_rounds=n, num_registers=32
        )
        # exact 0.9-effective diameter of the path: smallest t with
        # sum_i min(t+1, n-i) >= 0.9 * n(n+1)/2
        target = 0.9 * n * (n + 1) / 2
        exact = next(
            t
            for t in range(n + 1)
            if sum(min(t + 1, n - i) for i in range(n)) >= target
        )
        assert abs(d - exact) / exact < 0.35


PHI = 0.77351


def _trailing_ones(x: int) -> int:
    k = 0
    while x & 1:
        k += 1
        x >>= 1
    return k


def _portable_est_py(regs: list[int]) -> float:
    kk = sum(_trailing_ones(s) for s in regs)
    c = 2.0 ** ((kk % R) / R) / PHI
    return c * float(1 << (kk // R))


def _centralities_oracle(
    g: nx.DiGraph, rounds: int
) -> dict[str, tuple[float, float, float, float]]:
    """Round-by-round replay of hyperball_centralities' EXACT float
    arithmetic (same op order → bit-identical doubles)."""
    touched = {u for e in g.edges() for u in e}
    # incoming=True: ball of v grows along REVERSED edges
    state = {v: [_lowbit(_h(v, r)) for r in range(R)] for v in touched}
    est = {v: _portable_est_py(s) for v, s in state.items()}
    sumdist = {v: 0.0 for v in touched}
    harm = {v: 0.0 for v in touched}
    n = len(touched)
    for t in range(1, rounds + 1):
        new_state = {}
        for v in touched:
            s = list(state[v])
            for u in g.successors(v):  # reversed edge v->u pulls u's ball
                for r in range(R):
                    s[r] |= state[u][r]
            new_state[v] = s
        state = new_state
        for v in touched:
            ne = _portable_est_py(state[v])
            sumdist[v] = sumdist[v] + float(t) * (ne - est[v])
            harm[v] = harm[v] + (ne - est[v]) / float(t)
            est[v] = ne
    out = {}
    for v in touched:
        if sumdist[v] > 0.0:
            close = ((est[v] - 1.0) / sumdist[v]) * (
                (est[v] - 1.0) / float(n - 1)
            )
        else:
            close = 0.0
        out[v] = (est[v], sumdist[v], harm[v], close)
    return out


class TestCentralities:
    def test_bit_for_bit_vs_python_replay(self, spark):
        from grandiso_networkx_spark.operators.hyperball import (
            hyperball_centralities,
        )

        g = nx.fast_gnp_random_graph(40, 0.07, directed=True, seed=23)
        g = nx.relabel_nodes(g, str)
        g.remove_edges_from(nx.selfloop_edges(g))
        # oracle propagates over g.successors of the REVERSED graph
        rev = g.reverse()
        got = {
            r["id"]: (
                r["reach_est"],
                r["sum_dist_est"],
                r["harmonic_est"],
                r["closeness_est"],
            )
            for r in hyperball_centralities(
                _edges_df(spark, g), rounds=3, num_registers=R
            ).collect()
        }
        want = _centralities_oracle(rev, 3)
        assert got == want  # exact float equality by construction

    def test_fixed_point_ranks_track_exact_harmonic(self, spark):
        from grandiso_networkx_spark.operators.hyperball import (
            hyperball_centralities,
        )

        # directed path: harmonic centrality of node i is H(i), strictly
        # increasing along the path — a 32-register sketch must get the
        # broad ordering right (compare top/bottom thirds).
        n = 30
        g = nx.path_graph(n, create_using=nx.DiGraph)
        g = nx.relabel_nodes(g, str)
        got = {
            int(r["id"]): r["harmonic_est"]
            for r in hyperball_centralities(
                _edges_df(spark, g), rounds=None, num_registers=32
            ).collect()
        }
        lo = sum(got[i] for i in range(1, n // 3)) / (n // 3 - 1)
        hi = sum(got[i] for i in range(2 * n // 3, n)) / (n - 2 * n // 3)
        assert hi > 2.0 * lo

    def test_nonconvergence_raises(self, spark):
        from grandiso_networkx_spark.operators.hyperball import (
            hyperball_centralities,
        )

        import pytest

        g = nx.path_graph(12, create_using=nx.DiGraph)
        g = nx.relabel_nodes(g, str)
        with pytest.raises(RuntimeError, match="fixed point"):
            hyperball_centralities(
                _edges_df(spark, g), rounds=None, max_rounds=3
            )


class TestTwoHop:
    def test_exact_vs_networkx(self, spark):
        g = nx.fast_gnp_random_graph(35, 0.08, directed=True, seed=4)
        g = nx.relabel_nodes(g, str)
        g.remove_edges_from(nx.selfloop_edges(g))
        from grandiso_networkx_spark.operators.hyperball import (
            two_hop_counts,
        )

        got = {
            r.id: r.n_reach
            for r in two_hop_counts(_edges_df(spark, g)).collect()
        }
        for v in g.nodes():
            ball = set(g.successors(v))
            for u in list(ball):
                ball |= set(g.successors(u))
            ball.discard(v)
            if ball:
                assert got.get(v, 0) == len(ball), v
            else:
                assert v not in got
