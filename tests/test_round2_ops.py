"""Round-2 additions: PII detection/redaction, unigram LM scoring,
edge embeddedness (vs networkx), rich-club coefficient (vs
networkx.rich_club_coefficient), and the K4 motif count (vs grandiso
automorphism arithmetic)."""

import math

import networkx as nx
import pytest
from pyspark.sql import functions as F

from grandiso_networkx_spark.operators.lmscore import (
    lm_quality_buckets,
    unigram_logprob,
    unigram_model,
)
from grandiso_networkx_spark.operators.pii import pii_signals, redact_pii
from grandiso_networkx_spark.operators.stats import rich_club
from grandiso_networkx_spark.operators.triangles import edge_embeddedness


def _edges_df(spark, g):
    rows = [(str(u), str(v)) for u, v in g.edges()]
    return spark.createDataFrame(rows, "src string, dst string").distinct()


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestPII:
    TEXTS = [
        "reach me at alice.smith+work@example.co.uk or bob@test.io thanks",
        "server at 192.168.0.1 and backup 10.0.0.255 are down",
        "call 555-867-5309 or +1 415 555 0199 after hours",  # 2nd: no 3-3-4 shape
        "nothing sensitive here at all",
        "mixed: carol@x.org on 172.16.254.3, dial 650-253-0000",
    ]

    def test_counts(self, spark):
        got = {
            r.doc_id: (r.n_email, r.n_ipv4, r.n_phone, r.has_pii)
            for r in pii_signals(_docs_df(spark, self.TEXTS)).collect()
        }
        assert got[0] == (2, 0, 0, 1)
        assert got[1] == (0, 2, 0, 1)
        # "+1 415 555 0199" is 1-3-3-4: the 3-3-4 tail "415 555 0199" matches.
        assert got[2] == (0, 0, 2, 1)
        assert got[3] == (0, 0, 0, 0)
        assert got[4] == (1, 1, 1, 1)

    def test_redaction(self, spark):
        out = {
            r.doc_id: r.text_redacted
            for r in redact_pii(_docs_df(spark, self.TEXTS)).collect()
        }
        assert out[0] == "reach me at <EMAIL> or <EMAIL> thanks"
        assert out[1] == "server at <IP> and backup <IP> are down"
        assert "<PHONE>" in out[2] and "5309" not in out[2]
        assert out[3] == self.TEXTS[3]
        assert "<EMAIL>" in out[4] and "<IP>" in out[4] and "<PHONE>" in out[4]

    def test_redaction_order_email_wins_over_phone(self, spark):
        # Digits inside an email local part must not be phone-bitten.
        docs = _docs_df(spark, ["mail 555-123-4567x@example.com end"])
        out = redact_pii(docs).collect()[0].text_redacted
        assert out == "mail <EMAIL> end"


class TestUnigramLM:
    TEXTS = [
        "the cat sat",
        "the dog sat",
        "the the the",
        "zyzzyva qwop",
    ]

    def _oracle(self):
        toks = [t.lower().split() for t in self.TEXTS]
        flat = [w for ts in toks for w in ts]
        total = len(flat)
        logp = {w: math.log(flat.count(w) / total) for w in set(flat)}
        return {
            i: (len(ts), sum(logp[w] for w in ts) / len(ts))
            for i, ts in enumerate(toks)
        }

    def test_model_probs_sum_to_one(self, spark):
        m = unigram_model(_docs_df(spark, self.TEXTS))
        s = m.agg(F.sum(F.exp("logp"))).collect()[0][0]
        assert abs(s - 1.0) < 1e-9

    def test_per_doc_mean_logp(self, spark):
        got = {
            r.doc_id: (r.n_tokens, r.mean_logp)
            for r in unigram_logprob(_docs_df(spark, self.TEXTS)).collect()
        }
        want = self._oracle()
        assert set(got) == set(want)
        for i in want:
            assert got[i][0] == want[i][0]
            assert abs(got[i][1] - want[i][1]) < 1e-9
        # Rare-token soup scores strictly worse than the repeated-head doc.
        assert got[3][1] < got[2][1]

    def test_buckets_are_equal_frequency(self, spark):
        docs = _docs_df(spark, self.TEXTS * 3)  # 12 docs
        b = lm_quality_buckets(docs, n_buckets=3)
        sizes = {r.bucket: r.n for r in b.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        assert sizes == {1: 4, 2: 4, 3: 4}


class TestEdgeEmbeddedness:
    @pytest.mark.parametrize("seed", [3, 17])
    def test_vs_networkx(self, spark, seed):
        g = nx.fast_gnp_random_graph(25, 0.2, seed=seed)
        got = {
            (r.src, r.dst): r.common_neighbors
            for r in edge_embeddedness(_edges_df(spark, g)).collect()
        }
        want = {}
        for u, v in g.edges():
            a, b = sorted((str(u), str(v)))
            want[(a, b)] = len(list(nx.common_neighbors(g, u, v)))
        assert got == want


class TestRichClub:
    @pytest.mark.parametrize("seed", [5, 23])
    def test_vs_networkx(self, spark, seed):
        g = nx.fast_gnp_random_graph(30, 0.25, seed=seed)
        got = {
            r.k: (r.n_nodes, r.n_edges, r.rich_club)
            for r in rich_club(_edges_df(spark, g)).collect()
        }
        want = nx.rich_club_coefficient(g, normalized=False)
        assert set(got) == set(want)
        for k, phi in want.items():
            assert abs(got[k][2] - phi) < 1e-9
            # structural invariants of the suffix-sum formulation
            nk = sum(1 for _, d in g.degree() if d > k)
            ek = sum(
                1 for u, v in g.edges()
                if g.degree(u) > k and g.degree(v) > k
            )
            assert got[k][0] == nk and got[k][1] == ek


class TestClique4Motif:
    def test_vs_nx_clique_count(self, spark):
        from grandiso_networkx_spark.graph import HostGraph
        from grandiso_networkx_spark.operators.match import find_motifs_df
        from grandiso_networkx_spark.plans.motif import Motif

        g = nx.fast_gnp_random_graph(14, 0.45, seed=9)
        host = HostGraph(_edges_df(spark, g), directed=False)
        m = Motif(directed=False)
        for a, b in [("A", "B"), ("A", "C"), ("A", "D"),
                     ("B", "C"), ("B", "D"), ("C", "D")]:
            m.add_edge(a, b)
        n_mono = find_motifs_df(m, host).count()
        k4 = sum(1 for c in nx.enumerate_all_cliques(g) if len(c) == 4)
        # 24 monomorphisms per unordered K4 (|Aut(K4)| = 4!)
        assert n_mono == 24 * k4
