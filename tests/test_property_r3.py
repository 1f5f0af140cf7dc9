"""Hypothesis property tests for the round-3 machinery: the BPE
trainer/encoder against the pure-Python Sennrich reference on random
corpora, and global_row_number against sorted-enumerate on random
frames.  Example counts are small (each example runs Spark jobs) but
the generators cover the adversarial shapes: repeated-symbol runs
("aaaa"), ties in pair counts, empty/1-char words, duplicate rank
keys ruled out by the unique tie-break.
"""

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from grandiso_networkx_spark.operators.bpe import bpe_encode, bpe_merges

WORD = st.text(alphabet="ab c", min_size=0, max_size=8)
CORPUS = st.lists(WORD, min_size=1, max_size=6)

PROP_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ref_merge_word(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_bpe(texts, n_merges):
    c = Counter()
    for text in texts:
        for w in text.strip().lower().split():
            if w:
                c[w] += 1
    vocab = {w: (list(w), n) for w, n in c.items()}
    merges = []
    for idx in range(n_merges):
        pc = Counter()
        for syms, n in vocab.values():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((idx, l, r, cnt))
        vocab = {
            w: (_ref_merge_word(s, l, r), n) for w, (s, n) in vocab.items()
        }
    return merges


@given(texts=CORPUS)
@settings(**PROP_SETTINGS)
def test_bpe_merges_property(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    want = _ref_bpe(texts, 4)
    got = [
        (r.merge_idx, r.left, r.right, r.pair_count)
        for r in bpe_merges(docs, n_merges=4).orderBy("merge_idx").collect()
    ]
    assert got == want, texts


@given(texts=CORPUS)
@settings(**PROP_SETTINGS)
def test_bpe_encode_property(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    ref_merges = [(m[1], m[2]) for m in _ref_bpe(texts, 3)]
    enc = bpe_encode(docs, ref_merges)
    got = {}
    for r in enc.collect():
        got.setdefault((r.doc_id, r.widx), []).append((r.pos, r.piece))
    for did, text in enumerate(texts):
        for wi, w in enumerate(
            x for x in text.strip().lower().split() if x
        ):
            syms = list(w)
            for l, r in ref_merges:
                syms = _ref_merge_word(syms, l, r)
            pieces = [p for _, p in sorted(got.get((did, wi), []))]
            assert pieces == syms, (texts, did, wi)


@given(
    vals=st.lists(
        st.integers(min_value=-5, max_value=5), min_size=1, max_size=40
    ),
    nparts=st.integers(min_value=1, max_value=9),
)
@settings(**PROP_SETTINGS)
def test_global_row_number_property(spark, vals, nparts):
    from pyspark.sql import functions as F

    from grandiso_networkx_spark.functions.rank import global_row_number

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long")
    ranked = {
        r["id"]: r["__rank"]
        for r in global_row_number(
            df, [F.col("v").desc(), F.col("id")], nparts
        ).collect()
    }
    want = {
        rid: rank + 1
        for rank, (rid, _) in enumerate(
            sorted(rows, key=lambda t: (-t[1], t[0]))
        )
    }
    assert ranked == want, (vals, nparts)
