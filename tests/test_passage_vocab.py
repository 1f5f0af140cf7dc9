"""Unit oracles for passage_dedup (C4/Gopher-style boilerplate
removal) and vocab_coverage (tokenizer planning curve)."""

import pytest

from grandiso_networkx_spark.operators.dedup import passage_dedup
from grandiso_networkx_spark.operators.textstats import vocab_coverage


class TestPassageDedup:
    def test_boilerplate_removed_first_occurrence_kept(self, spark):
        # window chunks dedup ALIGNED passages: the shared boilerplate
        # sits at chunk 0 of every doc (window=5 == its length)
        boiler = "all rights reserved contact us"
        docs = spark.createDataFrame(
            [
                (1, f"{boiler} unique alpha text here"),
                (2, f"{boiler} unique beta text here"),
                (3, boiler),
            ],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r
            for r in passage_dedup(docs, delimiter=None, window=5).collect()
        }
        # doc 1 owns the boilerplate passage (min doc_id) and keeps both
        assert got[1].n_passages == 2 and got[1].n_kept == 2
        # doc 2 loses the boilerplate chunk but keeps its unique tail
        assert got[2].n_passages == 2 and got[2].n_kept == 1
        assert got[2].text_dedup == "unique beta text here"
        # doc 3 is pure boilerplate -> empty survivor, row still present
        assert got[3].n_kept == 0 and got[3].text_dedup == ""

    def test_delimiter_mode_preserves_order(self, spark):
        docs = spark.createDataFrame(
            [(1, "para one##para two##para three"), (2, "para two##tail")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r for r in passage_dedup(docs, delimiter="##").collect()
        }
        assert got[1].text_dedup == "para one##para two##para three"
        assert got[2].text_dedup == "tail"
        assert (got[1].n_passages, got[2].n_passages) == (3, 2)

    def test_within_doc_repeats_collapse(self, spark):
        docs = spark.createDataFrame(
            [(7, "x y##x y##z")], "doc_id long, text string"
        )
        row = passage_dedup(docs, delimiter="##").collect()[0]
        assert row.n_passages == 3 and row.n_kept == 2
        assert row.text_dedup == "x y##z"

    def test_every_doc_decided(self, spark):
        docs = spark.createDataFrame(
            [(i, f"w{i} " * 3) for i in range(10)], "doc_id long, text string"
        )
        out = passage_dedup(docs, window=2)
        assert out.count() == 10
        assert out.where("n_kept > n_passages").count() == 0


class TestVocabCoverage:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        # frequencies: a=6, b=3, c=2, d=1 (total 12)
        return spark.createDataFrame(
            [(1, "a a a b b c"), (2, "a a a b c d")],
            "doc_id long, text string",
        )

    def test_curve_exact(self, spark, docs):
        rows = vocab_coverage(docs, top_v=10).orderBy("rank").collect()
        assert [(r.rank, r.tok, r.n) for r in rows] == [
            (1, "a", 6), (2, "b", 3), (3, "c", 2), (4, "d", 1),
        ]
        assert [r.cum_frac for r in rows] == [0.5, 0.75, pytest.approx(11 / 12, abs=1e-6), 1.0]

    def test_top_v_truncates_but_denominator_is_global(self, spark, docs):
        rows = vocab_coverage(docs, top_v=2).orderBy("rank").collect()
        assert len(rows) == 2
        # coverage still relative to ALL 12 occurrences
        assert rows[-1].cum_frac == 0.75

    def test_tie_break_lexicographic(self, spark):
        docs = spark.createDataFrame(
            [(1, "z q z q m")], "doc_id long, text string"
        )
        rows = vocab_coverage(docs, top_v=3).orderBy("rank").collect()
        assert [r.tok for r in rows] == ["q", "z", "m"]
