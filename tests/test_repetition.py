"""Gopher-style repetition filters + n-gram decontamination vs a
pure-python Counter oracle (exact, word-fraction definitions pinned in
the operator docstring)."""

import random
from collections import Counter

from grandiso_networkx_spark.operators.textstats import (
    ngram_contamination,
    repetition_features,
)


def _oracle(text: str) -> tuple[int, float, float, float]:
    toks = text.split()
    nw = len(toks)
    safe = max(nw, 1)
    uni = Counter(toks)
    d1 = sum(c for c in uni.values() if c >= 2)
    bi = Counter(
        " ".join(toks[i : i + 2]) for i in range(nw - 1)
    )
    m2 = max(bi.values()) if bi else 0
    tri = Counter(
        " ".join(toks[i : i + 3]) for i in range(nw - 2)
    )
    d3 = sum(c for c in tri.values() if c >= 2)
    return nw, d1 / safe, m2 * 2 / safe, d3 * 3 / safe


class TestRepetition:
    def test_hand_cases(self, spark):
        rows = [
            (0, "a a a b"),
            (1, "x y z"),
            (2, ""),
            (3, "p q p q p q"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in repetition_features(df).collect()}
        # doc 0: 'a'x3 dup -> 0.75; bigram 'a a'x2 -> 2*2/4; no dup trigram
        assert got[0].n_words == 4
        assert abs(got[0].dup_word_frac - 0.75) < 1e-9
        assert abs(got[0].top_bigram_frac - 1.0) < 1e-9
        assert got[0].dup_trigram_frac == 0.0
        # doc 1: no repetition at all
        assert got[1].dup_word_frac == 0.0
        assert abs(got[1].top_bigram_frac - round(2 / 3, 6)) < 1e-9
        # doc 2: blank -> 0 words, all fractions 0
        assert got[2].n_words == 0
        assert got[2].dup_word_frac == 0.0
        assert got[2].top_bigram_frac == 0.0
        # doc 3: 'p q'x3 + 'q p'x2 bigrams, 'p q p'x2 + 'q p q'x2 trigrams
        assert abs(got[3].dup_word_frac - 1.0) < 1e-9
        assert abs(got[3].top_bigram_frac - 1.0) < 1e-9
        assert abs(got[3].dup_trigram_frac - (4 * 3) / 6) < 1e-9

    def test_random_vs_oracle(self, spark):
        rng = random.Random(17)
        vocab = ["w%d" % i for i in range(6)]
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in repetition_features(df).collect()}
        assert len(got) == 60
        for i, text in rows:
            nw, d1, t2, d3 = _oracle(text)
            assert got[i].n_words == nw, i
            assert abs(got[i].dup_word_frac - round(d1, 6)) < 2e-6, i
            assert abs(got[i].top_bigram_frac - round(t2, 6)) < 2e-6, i
            assert abs(got[i].dup_trigram_frac - round(d3, 6)) < 2e-6, i


class TestContamination:
    def test_overlap_flags(self, spark):
        docs = spark.createDataFrame(
            [
                (0, "one two three four five six"),
                (1, "zz one two three four yy"),
                (2, "totally different words here entirely now"),
                (3, "short doc"),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [("one two three four five six seven",)], "text string"
        )
        got = {
            r.doc_id: r
            for r in ngram_contamination(docs, bench, n=4).collect()
        }
        # doc 0 shares 3 distinct 4-grams with the bench doc
        assert got[0].shared_ngrams == 3 and got[0].contaminated
        # doc 1's zz/yy padding leaves exactly one clean shared 4-gram
        assert got[1].shared_ngrams == 1 and got[1].contaminated
        assert got[2].shared_ngrams == 0 and not got[2].contaminated
        # doc 3 is shorter than n: no grams, never contaminated
        assert got[3].shared_ngrams == 0 and not got[3].contaminated

    def test_internal_repetition_not_inflated(self, spark):
        # the doc repeats the contaminated 4-gram twice, but grams are
        # deduped per doc before the join -> counted once
        docs = spark.createDataFrame(
            [(0, "a b c d a b c d")], "doc_id long, text string"
        )
        bench = spark.createDataFrame([("a b c d",)], "text string")
        (row,) = ngram_contamination(docs, bench, n=4).collect()
        assert row.shared_ngrams == 1


class TestTokenEntropy:
    def test_vs_math(self, spark):
        import math
        from collections import Counter

        from grandiso_networkx_spark.operators.textstats import (
            token_entropy,
        )

        rows = [
            (0, "a a a a"),          # H = 0
            (1, "a b c d"),          # H = 2
            (2, "a a b b"),          # H = 1
            (3, ""),                 # empty -> 0
            (4, "x y y z z z"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in token_entropy(df).collect()}
        for i, text in rows:
            toks = text.split()
            n = len(toks)
            if n == 0:
                want = 0.0
            else:
                cnt = Counter(toks)
                want = -sum(
                    (c / n) * math.log2(c / n) for c in cnt.values()
                )
            assert abs(got[i].entropy - round(want, 6)) < 2e-6, i
            assert got[i].n_words == n
        assert got[0].entropy == 0.0 and got[1].entropy == 2.0


class TestCompressionRatio:
    def test_vs_zlib(self, spark):
        import zlib

        from grandiso_networkx_spark.operators.textstats import (
            compression_ratio,
        )

        rows = [
            (0, "abc " * 200),                    # highly compressible
            (1, "the quick brown fox jumps"),
            (2, ""),                              # blank -> null ratio
            (3, "x"),                             # 1 byte -> null ratio
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in compression_ratio(df).collect()}
        for i, text in rows:
            raw = text.encode()
            assert got[i].n_bytes == len(raw), i
            if len(raw) > 1:
                want = round(len(zlib.compress(raw, 6)) / len(raw), 6)
                assert abs(got[i].ratio - want) < 1e-9, i
            else:
                assert got[i].ratio is None, i
        # the repetitive doc compresses far better than the prose doc
        assert got[0].ratio < got[1].ratio
