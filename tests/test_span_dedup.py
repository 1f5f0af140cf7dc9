"""Span-level dedup (duplicate_spans), containment pairs, and the
average-degree-connectivity curve."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from grandiso_networkx_spark.operators import dedup
from grandiso_networkx_spark.operators.stats import avg_degree_connectivity


class TestDuplicateSpans:
    def test_planted_shared_span(self, spark):
        # A 12-token block pasted into two otherwise-disjoint docs.
        block = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
        docs = spark.createDataFrame(
            [
                (0, "intro one two three " + block + " outro four five"),
                (1, "other preamble words here " + block),
                (2, "no overlap at all in this document body"),
            ],
            "doc_id long, text string",
        )
        spans = dedup.duplicate_spans(docs, k=5, max_df=None).collect()
        assert len(spans) == 1
        s = spans[0]
        assert (s.a, s.b) == (0, 1)
        assert s.span_len == 12
        # doc 0: 4 intro tokens -> block starts at token 5 (1-based).
        assert s.start_a == 5
        # doc 1: 4 preamble tokens -> block starts at token 5.
        assert s.start_b == 5

    def test_two_disjoint_spans_stay_separate(self, spark):
        s1 = "one two three four five six"
        s2 = "red orange yellow green blue violet"
        docs = spark.createDataFrame(
            [
                (0, s1 + " xxfiller yyfiller " + s2),
                (1, s2 + " zz qq ww ee rr tt " + s1),
            ],
            "doc_id long, text string",
        )
        spans = dedup.duplicate_spans(docs, k=4, max_df=None)
        got = {(r.start_a, r.start_b, r.span_len) for r in spans.collect()}
        # s1: doc0 tokens 1-6, doc1 tokens 13-18; s2: doc0 9-14, doc1 1-6.
        assert got == {(1, 13, 6), (9, 1, 6)}

    def test_min_len_filters(self, spark):
        shared = "a b c d e f g h"
        docs = spark.createDataFrame(
            [(0, shared + " tail0"), (1, shared + " tail1")],
            "doc_id long, text string",
        )
        assert dedup.duplicate_spans(docs, k=3, min_len=9, max_df=None).count() == 0
        out = dedup.duplicate_spans(docs, k=3, min_len=8, max_df=None).collect()
        assert len(out) == 1 and out[0].span_len == 8

    def test_repeated_gram_within_doc(self, spark):
        # The same k-gram at two positions in doc 0 matches doc 1's one
        # occurrence twice -> two spans, one per diagonal.
        docs = spark.createDataFrame(
            [
                (0, "p q r s p q r s"),
                (1, "z z p q r s z z"),
            ],
            "doc_id long, text string",
        )
        got = {
            (r.start_a, r.start_b, r.span_len)
            for r in dedup.duplicate_spans(docs, k=4, max_df=None).collect()
        }
        assert got == {(1, 3, 4), (5, 3, 4)}

    def test_max_df_guard_drops_boilerplate(self, spark):
        boiler = "this site uses cookies accept all"
        docs = spark.createDataFrame(
            [(i, boiler + f" unique{i} tail{i}") for i in range(6)],
            "doc_id long, text string",
        )
        # Every gram of the boilerplate occurs 6 times > max_df=5 -> no spans.
        assert dedup.duplicate_spans(docs, k=5, max_df=5).count() == 0
        # Raised guard admits them: C(6,2)=15 pairs share the block.
        spans = dedup.duplicate_spans(docs, k=5, max_df=6)
        assert spans.count() == 15

    def test_empty_and_short_docs(self, spark):
        docs = spark.createDataFrame(
            [(0, ""), (1, "   "), (2, "one two"), (3, None)],
            "doc_id long, text string",
        )
        assert dedup.duplicate_spans(docs, k=3, max_df=None).count() == 0


class TestContainmentPairs:
    def test_doc_inside_doc(self, spark):
        quote = "to be or not to be that is the question"
        article = (
            "in the famous soliloquy hamlet asks "
            + quote
            + " and the line echoes through centuries of criticism"
        )
        docs = spark.createDataFrame(
            [(0, quote), (1, article), (2, "unrelated words entirely here")],
            "doc_id long, text string",
        )
        # Jaccard misses the pair at 0.5; containment catches it at 1.0.
        assert (
            dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.9, max_df=None).count()
            == 0
        )
        got = dedup.ngram_containment_pairs(
            docs, n=3, threshold=0.9, max_df=None
        ).collect()
        assert len(got) == 1
        assert (got[0].a, got[0].b) == (0, 1)
        assert got[0].containment == pytest.approx(1.0)

    def test_oracle_vs_python_sets(self, spark):
        rows = [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumped over the lazy dog"),
            (2, "quick brown fox jumps"),
            (3, "totally different content in every way"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        n = 2

        def grams(t):
            w = t.lower().split()
            return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

        want = {}
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, b = grams(rows[i][1]), grams(rows[j][1])
                inter = len(a & b)
                if inter:
                    want[(i, j)] = inter / min(len(a), len(b))
        got = {
            (r.a, r.b): r.containment
            for r in dedup.ngram_containment_pairs(
                docs, n=n, threshold=0.0, max_df=None
            ).collect()
        }
        assert set(got) == set(want)
        for key in want:
            assert got[key] == pytest.approx(want[key])


class TestAvgDegreeConnectivity:
    def _check(self, spark, g):
        edges = spark.createDataFrame(list(g.edges()), "src long, dst long")
        want = nx.average_degree_connectivity(g)
        got = {r.deg: r.knn for r in avg_degree_connectivity(edges).collect()}
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k])

    def test_star_and_path(self, spark):
        self._check(spark, nx.star_graph(5))
        self._check(spark, nx.path_graph(6))

    def test_random_graph(self, spark):
        g = nx.gnp_random_graph(40, 0.15, seed=7)
        g.remove_nodes_from(list(nx.isolates(g)))
        self._check(spark, g)

    def test_directed_input_symmetrized(self, spark):
        # Directed edge list is treated as its undirected simple graph.
        edges = spark.createDataFrame(
            [(1, 2), (2, 1), (2, 3)], "src long, dst long"
        )
        want = nx.average_degree_connectivity(nx.Graph([(1, 2), (2, 3)]))
        got = {r.deg: r.knn for r in avg_degree_connectivity(edges).collect()}
        assert got == pytest.approx(want)


class TestRemoveDuplicateSpans:
    def test_keep_first_remove_second(self, spark):
        block = "alpha bravo charlie delta echo foxtrot"
        docs = spark.createDataFrame(
            [
                (0, "intro " + block + " outro"),
                (1, "pre " + block + " post"),
                (2, "untouched words here entirely"),
            ],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in dedup.remove_duplicate_spans(docs, k=4, max_df=None).collect()
        }
        assert out[0].n_removed == 0
        assert out[0].text_dedup == "intro " + block + " outro"
        assert out[1].n_removed == 6
        assert out[1].text_dedup == "pre post"
        assert out[2].n_removed == 0
        assert out[2].text_dedup == "untouched words here entirely"

    def test_overlapping_ranges_union(self, spark):
        s = "a b c d e f g h"
        docs = spark.createDataFrame(
            [(0, s), (1, s), (2, "x y " + s + " z w")],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in dedup.remove_duplicate_spans(docs, k=3, max_df=None).collect()
        }
        # doc 0 is always the 'a' side: untouched.
        assert out[0].n_removed == 0
        # doc 1 loses the whole block once despite matching both 0 and 2.
        assert out[1].n_removed == 8 and out[1].text_dedup == ""
        assert out[2].n_removed == 8 and out[2].text_dedup == "x y z w"

    def test_empty_docs_pass_through(self, spark):
        docs = spark.createDataFrame(
            [(0, ""), (1, None), (2, "one two three")],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: (r.n_tokens, r.n_removed, r.text_dedup)
            for r in dedup.remove_duplicate_spans(docs, k=3, max_df=None).collect()
        }
        assert out == {
            0: (0, 0, ""),
            1: (0, 0, ""),
            2: (3, 0, "one two three"),
        }
