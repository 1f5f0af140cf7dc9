"""Neighborhood MinHash: signatures bit-for-bit vs a python replay of
the identical md5 arithmetic; pairs = exactly the band-sharing pairs of
that replay; estimate quality sanity on planted twins."""

import hashlib

import networkx as nx

from grandiso_networkx_spark.operators.neighbor_minhash import (
    minhash_neighbor_signatures,
    neighbor_similarity_pairs,
)

SEED = 42
H = 8


def _h(u: str, h: int, seed: int = SEED) -> int:
    return int(hashlib.md5(f"{u}|{h}|{seed}".encode()).hexdigest()[:15], 16)


def _sig_oracle(g: nx.Graph) -> dict[str, list[int]]:
    return {
        v: [min(_h(u, h) for u in g.neighbors(v)) for h in range(H)]
        for v in g.nodes()
        if g.degree(v) > 0
    }


def _edges_df(spark, g):
    return spark.createDataFrame(
        [(str(u), str(v)) for u, v in g.edges()], "src string, dst string"
    )


class TestSignatures:
    def test_bit_for_bit(self, spark):
        g = nx.gnp_random_graph(30, 0.12, seed=2)
        g = nx.relabel_nodes(g, str)
        got = {
            r.id: [r[f"sig{h}"] for h in range(H)]
            for r in minhash_neighbor_signatures(
                _edges_df(spark, g), num_hashes=H
            ).collect()
        }
        assert got == _sig_oracle(g)

    def test_identical_neighborhoods_identical_sigs(self, spark):
        # a and b both connect to exactly {x, y, z}
        rows = [("a", n) for n in "xyz"] + [("b", n) for n in "xyz"]
        df = spark.createDataFrame(rows, "src string, dst string")
        got = {
            r.id: [r[f"sig{h}"] for h in range(H)]
            for r in minhash_neighbor_signatures(df, num_hashes=H).collect()
        }
        assert got["a"] == got["b"]


class TestPairs:
    def test_twins_found_with_estimate_one(self, spark):
        g = nx.gnp_random_graph(25, 0.1, seed=6)
        g = nx.relabel_nodes(g, str)
        # plant twin vertices t1/t2 with identical neighborhoods
        for n in ("0", "1", "2", "3"):
            g.add_edge("t1", n)
            g.add_edge("t2", n)
        pairs = {
            (r.a, r.b): r.est_jaccard
            for r in neighbor_similarity_pairs(
                _edges_df(spark, g), num_hashes=H, bands=4, threshold=0.5
            ).collect()
        }
        assert pairs.get(("t1", "t2")) == 1.0

    def test_pairs_match_band_replay(self, spark):
        g = nx.gnp_random_graph(20, 0.25, seed=9)
        g = nx.relabel_nodes(g, str)
        got = {
            (r.a, r.b)
            for r in neighbor_similarity_pairs(
                _edges_df(spark, g), num_hashes=H, bands=4
            ).collect()
        }
        sigs = _sig_oracle(g)
        want = set()
        ids = sorted(sigs)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                for band in range(4):
                    lo, hi = band * 2, band * 2 + 2
                    if sigs[a][lo:hi] == sigs[b][lo:hi]:
                        want.add((a, b))
                        break
        assert got == want
