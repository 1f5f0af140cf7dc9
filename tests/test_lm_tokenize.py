"""Bigram LM scoring and vocab/tokenize-to-ids vs pure-Python
references."""

import math
from collections import Counter

import pytest

from grandiso_networkx_spark.operators.lmscore import (
    bigram_logprob,
    bigram_model,
)
from grandiso_networkx_spark.operators.tokenize import token_ids, vocab_table

DOCS = [
    (0, "the cat sat on the mat", ),
    (1, "the dog sat on the log", ),
    (2, "cat and dog", ),
    (3, "", ),
    (4, "single", ),
    (5, "THE the The", ),
]


def _toks(text):
    t = text.strip().lower()
    return t.split() if t else []


def _ref_bigram_model(docs, k=1.0):
    c2, c1 = Counter(), Counter()
    vocab = set()
    for _, text in docs:
        ts = _toks(text)
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    V = len(vocab)
    return {
        (a, b): (n, math.log((n + k) / (c1[a] + k * V)))
        for (a, b), n in c2.items()
    }


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bigram_model_matches_reference(spark, docs_df):
    got = {
        (r.w1, r.w2): (r.n, r.logp) for r in bigram_model(docs_df).collect()
    }
    want = _ref_bigram_model(DOCS)
    assert set(got) == set(want)
    for key, (n, lp) in want.items():
        assert got[key][0] == n
        assert got[key][1] == pytest.approx(lp, abs=1e-12)


def test_bigram_logprob_self_scoring(spark, docs_df):
    got = {
        r.doc_id: (r.n_bigrams, r.mean_logp)
        for r in bigram_logprob(docs_df).collect()
    }
    model = _ref_bigram_model(DOCS)
    for did, text in DOCS:
        ts = _toks(text)
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            assert did not in got  # <2 tokens: dropped
            continue
        lps = [model[p][1] for p in pairs]
        assert got[did][0] == len(pairs)
        assert got[did][1] == pytest.approx(sum(lps) / len(lps), abs=1e-12)


def test_bigram_heldout_floor(spark, docs_df):
    """Unseen pairs score the model's own add-k floor (training V rides
    the model via __v/__k, NOT the bigram support); unseen contexts
    ln(1/V)."""
    m = bigram_model(docs_df)
    target = spark.createDataFrame(
        [(100, "the zebra"), (101, "qq zz")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_bigrams, r.mean_logp)
        for r in bigram_logprob(target, model=m).collect()
    }
    model = _ref_bigram_model(DOCS)
    # V = the TRAINING corpus unigram vocabulary — includes tokens that
    # never enter a bigram ("single"), so it exceeds the bigram support.
    V = len({t for _, text in DOCS for t in _toks(text)})
    assert V > len({w for a, b in model for w in (a, b)})
    c1 = Counter()
    for (a, _), (n, _) in model.items():
        c1[a] += n
    # ("the","zebra"): context "the" seen, pair unseen
    assert got[100] == (1, pytest.approx(math.log(1.0 / (c1["the"] + V)), abs=1e-12))
    # ("qq","zz"): context unseen
    assert got[101] == (1, pytest.approx(math.log(1.0 / V), abs=1e-12))


def test_bigram_heldout_floor_bare_model_fallback(spark, docs_df):
    """A model frame stripped of __v/__k falls back to the documented
    support-derived V."""
    m = bigram_model(docs_df).select("w1", "w2", "n", "logp")
    target = spark.createDataFrame([(101, "qq zz")], "doc_id long, text string")
    got = {
        r.doc_id: r.mean_logp
        for r in bigram_logprob(target, model=m).collect()
    }
    model = _ref_bigram_model(DOCS)
    V = len({w for a, b in model for w in (a, b)})
    assert got[101] == pytest.approx(math.log(1.0 / V), abs=1e-12)


def test_vocab_table_ranking(spark, docs_df):
    got = [(r.tok, r.tid, r.n) for r in vocab_table(docs_df, 5).collect()]
    cnt = Counter(t for _, text in DOCS for t in _toks(text))
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert sorted(got, key=lambda x: x[1]) == [
        (tok, i, n) for i, (tok, n) in enumerate(want)
    ]


def test_token_ids_with_oov(spark, docs_df):
    ids = {
        (r.doc_id, r.pos): r.tid
        for r in token_ids(docs_df, max_vocab=3).collect()
    }
    cnt = Counter(t for _, text in DOCS for t in _toks(text))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    vmap = {tok: i for i, (tok, _) in enumerate(ranked[:3])}
    for did, text in DOCS:
        for pos, tok in enumerate(_toks(text)):
            assert ids[(did, pos)] == vmap.get(tok, -1), (did, pos, tok)
    # blank doc contributes nothing
    assert not any(d == 3 for d, _ in ids)


def test_vocab_validation(spark, docs_df):
    with pytest.raises(ValueError):
        vocab_table(docs_df, 0)


def test_zipf_fit_matches_numpy(spark, docs_df):
    import math

    import numpy as np

    from grandiso_networkx_spark.operators.tokenize import zipf_fit

    row = zipf_fit(docs_df).collect()[0]
    cnt = Counter(t for _, text in DOCS for t in _toks(text))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    x = np.log(np.arange(1, len(ranked) + 1, dtype=float))
    y = np.log(np.array([n for _, n in ranked], dtype=float))
    slope = ((x - x.mean()) * (y - y.mean())).mean() / ((x - x.mean()) ** 2).mean()
    inter = y.mean() - slope * x.mean()
    r2 = (((x - x.mean()) * (y - y.mean())).mean() ** 2) / (
        ((x - x.mean()) ** 2).mean() * ((y - y.mean()) ** 2).mean()
    )
    assert row.n_types == len(ranked)
    assert row.n_tokens == sum(cnt.values())
    assert row.slope == pytest.approx(slope, abs=1e-6)
    assert row.intercept == pytest.approx(inter, abs=1e-6)
    assert row.r2 == pytest.approx(r2, abs=1e-6)


def test_zipf_slope_negative_on_real_text(spark):
    from grandiso_networkx_spark.operators.tokenize import zipf_fit

    docs = spark.createDataFrame(
        [(i, ("the quick brown fox " * (i % 5 + 1)) + f"rare{i}")
         for i in range(40)],
        "doc_id long, text string",
    )
    row = zipf_fit(docs).collect()[0]
    assert row.slope < 0
    assert 0 <= row.r2 <= 1


def test_heaps_fit_matches_numpy(spark, docs_df):
    import numpy as np

    from grandiso_networkx_spark.operators.tokenize import heaps_fit

    row = heaps_fit(docs_df).collect()[0]
    stream = []
    for did, text in sorted(DOCS):
        stream.extend(_toks(text))
    firsts = {}
    for i, t in enumerate(stream):
        firsts.setdefault(t, i)
    pos = sorted(firsts.values())
    x = np.log(np.array(pos, dtype=float) + 1)
    y = np.log(np.arange(1, len(pos) + 1, dtype=float))
    slope = ((x - x.mean()) * (y - y.mean())).mean() / ((x - x.mean()) ** 2).mean()
    k = float(np.exp(y.mean() - slope * x.mean()))
    r2 = (((x - x.mean()) * (y - y.mean())).mean() ** 2) / (
        ((x - x.mean()) ** 2).mean() * ((y - y.mean()) ** 2).mean()
    )
    assert row.n_types == len(pos)
    assert row.n_tokens == len(stream)
    assert row.beta == pytest.approx(slope, abs=1e-6)
    assert row.k == pytest.approx(k, abs=1e-5)
    assert row.r2 == pytest.approx(r2, abs=1e-6)
