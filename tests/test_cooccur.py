"""Skip-gram pairs + PMI vs a pure python Counter oracle (definitions
pinned in the operator docstring)."""

import math
import random
from collections import Counter

from grandiso_networkx_spark.operators.cooccur import pmi_pairs, skipgram_pairs


def _oracle(texts, window):
    pair_c, tok_c = Counter(), Counter()
    for t in texts:
        toks = t.split()
        tok_c.update(toks)
        for i, a in enumerate(toks):
            for j in range(i + 1, min(i + window, len(toks) - 1) + 1):
                pair_c[(a, toks[j])] += 1
    return pair_c, tok_c


class TestSkipgram:
    def test_hand_case(self, spark):
        df = spark.createDataFrame(
            [(0, "a b a b")], "doc_id long, text string"
        )
        got = {
            (r.left_tok, r.right_tok): r.n_pairs
            for r in skipgram_pairs(df, window=2).collect()
        }
        # positions: a1 b2 a3 b4; window 2 pairs:
        # (a,b)x2 from 1-2, 3-4; (a,a) 1-3; (b,a) 2-3; (b,b) 2-4; (a,b) 3-4 dup counted
        assert got == {("a", "b"): 2, ("a", "a"): 1, ("b", "a"): 1, ("b", "b"): 1}

    def test_random_vs_oracle(self, spark):
        rng = random.Random(5)
        vocab = [f"w{i}" for i in range(8)]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
            for _ in range(40)
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        for window in (1, 3):
            got = {
                (r.left_tok, r.right_tok): r.n_pairs
                for r in skipgram_pairs(df, window=window).collect()
            }
            want, _ = _oracle(texts, window)
            assert got == dict(want), window


class TestPMI:
    def test_vs_oracle(self, spark):
        rng = random.Random(12)
        vocab = [f"w{i}" for i in range(6)]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(20)) for _ in range(30)
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        window, min_c = 2, 3
        got = {
            (r.left_tok, r.right_tok): (r.n_pairs, r.pmi)
            for r in pmi_pairs(df, window=window, min_pair_count=min_c).collect()
        }
        pair_c, tok_c = _oracle(texts, window)
        n_all = sum(pair_c.values())
        t_tok = sum(tok_c.values())
        want = {
            (a, b): (
                c,
                math.log(
                    (c / n_all) / ((tok_c[a] / t_tok) * (tok_c[b] / t_tok))
                ),
            )
            for (a, b), c in pair_c.items()
            if c >= min_c
        }
        assert set(got) == set(want)
        for k, (c, p) in want.items():
            assert got[k][0] == c
            assert abs(got[k][1] - p) < 1e-9, k

    def test_collocation_scores_high(self, spark):
        # 'new york' always adjacent; 'the' everywhere
        texts = ["the new york the crowd the new york the"] * 5
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            (r.left_tok, r.right_tok): r.pmi
            for r in pmi_pairs(df, window=1).collect()
        }
        assert got[("new", "york")] > got[("the", "new")]
