"""BPE merge induction + encoding vs a pure-Python Sennrich-style
reference (greedy left-to-right pair merging, most-frequent pair per
round, ties lexicographic)."""

import pytest

from grandiso_networkx_spark.operators.bpe import bpe_encode, bpe_merges

DOCS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest newest"),
    (2, "newest newest newest widest widest"),
    (3, "aaa aaab banana"),
    (4, ""),
    (5, "LOW Low lOw"),
]


def _ref_word_counts(docs):
    from collections import Counter

    c = Counter()
    for _, text in docs:
        for w in text.strip().lower().split():
            if w:
                c[w] += 1
    return c


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


def _ref_bpe(docs, n_merges):
    from collections import Counter

    vocab = {w: (list(w), n) for w, n in _ref_word_counts(docs).items()}
    merges = []
    for idx in range(n_merges):
        pc = Counter()
        for syms, n in vocab.values():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        merges.append((idx, l, r, cnt))
        vocab = {
            w: (_ref_merge_word(s, l, r), n) for w, (s, n) in vocab.items()
        }
    return merges


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bpe_merges_match_reference(spark, docs_df):
    got = [
        (r.merge_idx, r.left, r.right, r.pair_count)
        for r in bpe_merges(docs_df, n_merges=8).orderBy("merge_idx").collect()
    ]
    assert got == _ref_bpe(DOCS, 8)


def test_bpe_merges_overlapping_runs(spark):
    """'aaaa' under merge (a,a) must yield ['aa','aa'] (greedy run
    parity), and 'aaa' -> ['aa','a']."""
    df = spark.createDataFrame(
        [(0, "aaaa aaa aa")], "doc_id long, text string"
    )
    got = [
        (r.left, r.right, r.pair_count)
        for r in bpe_merges(df, n_merges=2).orderBy("merge_idx").collect()
    ]
    want = [(m[1], m[2], m[3]) for m in _ref_bpe([(0, "aaaa aaa aa")], 2)]
    assert got == want


def test_bpe_encode_matches_reference(spark, docs_df):
    merges = bpe_merges(docs_df, n_merges=6)
    enc = bpe_encode(docs_df, merges)
    got = {}
    for r in enc.collect():
        got.setdefault((r.doc_id, r.widx), []).append((r.pos, r.piece))
    ref_merges = [(m[1], m[2]) for m in _ref_bpe(DOCS, 6)]
    for did, text in DOCS:
        words = [w for w in text.strip().lower().split() if w]
        for wi, w in enumerate(words):
            syms = list(w)
            for l, r in ref_merges:
                syms = _ref_merge_word(syms, l, r)
            pieces = [p for _, p in sorted(got.get((did, wi), []))]
            assert pieces == syms, (did, wi, w, pieces, syms)


def test_bpe_encode_accepts_literal_list(spark, docs_df):
    enc = bpe_encode(docs_df, [("l", "o"), ("lo", "w")])
    pieces = [
        r.piece
        for r in enc.where("doc_id = 0 AND widx = 0").orderBy("pos").collect()
    ]
    assert pieces == ["low"]


def test_min_frequency_stops_early(spark, docs_df):
    """Sennrich's --min-frequency: no merge with a winning count below
    the floor is emitted, and the cut is a prefix of the unfloored
    merge list."""
    full = [
        (r.merge_idx, r.left, r.right, r.pair_count)
        for r in bpe_merges(docs_df, n_merges=8).orderBy("merge_idx").collect()
    ]
    floor = 5
    cut = [
        (r.merge_idx, r.left, r.right, r.pair_count)
        for r in bpe_merges(docs_df, n_merges=8, min_frequency=floor)
        .orderBy("merge_idx")
        .collect()
    ]
    want = []
    for m in full:
        if m[3] < floor:
            break
        want.append(m)
    assert cut == want
    assert all(m[3] >= floor for m in cut)
    assert len(cut) < len(full)


def test_bpe_vocab(spark, docs_df):
    from grandiso_networkx_spark.operators.bpe import bpe_vocab

    merges = [("l", "o"), ("lo", "w")]
    got = {r.piece: r.n for r in bpe_vocab(docs_df, merges).collect()}
    from collections import Counter

    want = Counter()
    for _, text in DOCS:
        for w in text.strip().lower().split():
            syms = list(w)
            for l, r in merges:
                syms = _ref_merge_word(syms, l, r)
            want.update(syms)
    assert got == dict(want)


def test_validation(spark, docs_df):
    with pytest.raises(ValueError):
        bpe_merges(docs_df, 0)
    with pytest.raises(ValueError):
        bpe_merges(docs_df, 4, min_frequency=0)


# ---- r4: production-scale twins -------------------------------------

def _collect_merges(df):
    return [
        (r.merge_idx, r.left, r.right, r.pair_count)
        for r in df.orderBy("merge_idx").collect()
    ]


def _collect_encode(df):
    return sorted(
        (r.doc_id, r.widx, r.pos, r.piece) for r in df.collect()
    )


def test_bpe_merges_fast_identical(spark, docs_df):
    """The incremental-delta driver trainer must emit the IDENTICAL
    merge table (indexes, pairs, counts) to the distributed unrolled
    trainer — including tie-breaks and the early-stop rules."""
    from grandiso_networkx_spark.operators.bpe import bpe_merges_fast

    for n in (1, 4, 12):
        assert _collect_merges(bpe_merges_fast(docs_df, n_merges=n)) == \
            _collect_merges(bpe_merges(docs_df, n_merges=n))


def test_bpe_merges_fast_min_frequency(spark, docs_df):
    from grandiso_networkx_spark.operators.bpe import bpe_merges_fast

    for mf in (2, 5, 9):
        assert _collect_merges(
            bpe_merges_fast(docs_df, n_merges=12, min_frequency=mf)
        ) == _collect_merges(
            bpe_merges(docs_df, n_merges=12, min_frequency=mf)
        )


def test_bpe_merges_fast_random_corpora(spark):
    """Seeded random corpora: fast trainer == unrolled trainer, so the
    heap + delta bookkeeping agrees with brute-force recounting on
    adversarially repetitive text (runs, shared substrings, ties)."""
    import random

    from grandiso_networkx_spark.operators.bpe import bpe_merges_fast

    rng = random.Random(7)
    alphabet = "abcx"
    for trial in range(3):
        docs = [
            (
                i,
                " ".join(
                    "".join(
                        rng.choice(alphabet)
                        for _ in range(rng.randint(1, 7))
                    )
                    for _ in range(rng.randint(0, 9))
                ),
            )
            for i in range(12)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        assert _collect_merges(bpe_merges_fast(df, n_merges=10)) == \
            _collect_merges(bpe_merges(df, n_merges=10)), f"trial {trial}"


def test_bpe_merges_fast_max_train_words(spark, docs_df):
    from grandiso_networkx_spark.operators.bpe import bpe_merges_fast

    with pytest.raises(ValueError, match="max_train_words"):
        bpe_merges_fast(docs_df, n_merges=2, max_train_words=3)


def test_bpe_merges_fast_min_word_count(spark, docs_df):
    """min_word_count prunes rare words from TRAINING — equivalent to
    training the unrolled way on the pruned word table."""
    from grandiso_networkx_spark.operators.bpe import bpe_merges_fast

    kept = [
        (w, n)
        for w, n in _ref_word_counts(DOCS).items()
        if n >= 3
    ]
    # expand back to a corpus with those exact counts
    docs = [(i, " ".join([w] * n)) for i, (w, n) in enumerate(kept)]
    df_pruned = spark.createDataFrame(docs, "doc_id long, text string")
    got = _collect_merges(
        bpe_merges_fast(
            spark.createDataFrame(DOCS, "doc_id long, text string"),
            n_merges=8,
            min_word_count=3,
        )
    )
    assert got == _collect_merges(bpe_merges(df_pruned, n_merges=8))


def test_bpe_encode_fast_identical(spark, docs_df):
    """mapInPandas encode twin == the SQL-replayable window chain on
    the module corpus (incl. empty docs and case folding)."""
    from grandiso_networkx_spark.operators.bpe import bpe_encode_fast

    merges = bpe_merges(docs_df, n_merges=8)
    assert _collect_encode(bpe_encode_fast(docs_df, merges)) == \
        _collect_encode(bpe_encode(docs_df, merges))


def test_bpe_encode_fast_whitespace_parity(spark):
    """Tab/newline edges: widx must count split-array slots exactly
    like posexplode-then-filter (leading \\t makes an empty slot 0)."""
    from grandiso_networkx_spark.operators.bpe import bpe_encode_fast

    docs = [
        (0, "\tab ab"),
        (1, "ab\t\nab\t"),
        (2, "  ab  "),
        (3, "a\x0bb"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = [("a", "b")]
    assert _collect_encode(bpe_encode_fast(df, merges)) == \
        _collect_encode(bpe_encode(df, merges))


def test_bpe_encode_fast_random(spark):
    """Seeded random corpora through a 16-merge table: substring
    prefilter + memoized kernel == window chain."""
    import random

    from grandiso_networkx_spark.operators.bpe import bpe_encode_fast

    rng = random.Random(13)
    docs = [
        (
            i,
            " ".join(
                "".join(rng.choice("abcde") for _ in range(rng.randint(1, 9)))
                for _ in range(rng.randint(0, 8))
            ),
        )
        for i in range(20)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = bpe_merges(df, n_merges=16)
    assert _collect_encode(bpe_encode_fast(df, merges)) == \
        _collect_encode(bpe_encode(df, merges))


def test_bpe_encode_segmented_checkpoint_identical(spark, docs_df):
    """checkpoint_every segmentation must not change results."""
    merges = bpe_merges(docs_df, n_merges=8)
    assert _collect_encode(
        bpe_encode(docs_df, merges, checkpoint_every=3)
    ) == _collect_encode(bpe_encode(docs_df, merges, checkpoint_every=None))
