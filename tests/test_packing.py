"""Sequence packing / chunking / mixing vs pure-Python references."""

import hashlib
import math

import pytest

from grandiso_networkx_spark.operators.packing import (
    chunk_documents,
    mixture_sample,
    mixture_weights,
    pack_sequences,
    pack_stats,
)

DOCS = [
    (0, "a b c d e", "s0"),
    (1, "", "s0"),
    (2, "  f   g  ", "s1"),
    (3, " ".join(f"t{i}" for i in range(23)), "s1"),
    (4, "x", "s0"),
    (5, "p q r s t u v w", "s2"),
    (6, "   ", "s2"),
    (7, " ".join(f"u{i}" for i in range(11)), "s0"),
]


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ntok(text: str) -> int:
    t = text.strip()
    return 0 if not t else len(t.split())


def ref_pack(docs, budget, n_shards):
    rows = []
    shards = {}
    for did, text, _src in docs:
        n = _ntok(text)
        if n == 0:
            continue
        shards.setdefault(_hash60(str(did)) % n_shards, []).append((did, n))
    for sh, members in shards.items():
        cum = 0
        for did, n in sorted(members):
            start = cum
            cum += n
            for seq in range(start // budget, (cum - 1) // budget + 1):
                lo, hi = seq * budget, (seq + 1) * budget
                rows.append(
                    (
                        sh,
                        seq,
                        did,
                        max(lo - start, 0),
                        min(cum, hi) - max(start, lo),
                    )
                )
    return sorted(rows)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, source string")


@pytest.mark.parametrize("budget,n_shards", [(8, 1), (8, 4), (5, 2), (100, 3)])
def test_pack_sequences_matches_reference(spark, docs_df, budget, n_shards):
    got = sorted(
        tuple(r)
        for r in pack_sequences(docs_df, budget, n_shards=n_shards).collect()
    )
    assert got == ref_pack(DOCS, budget, n_shards)


def test_pack_windows_exactly_full(spark, docs_df):
    packed = pack_sequences(docs_df, 8, n_shards=1)
    stats = {
        (r["shard"], r["seq"]): (r["n_pieces"], r["fill"], r["fill_ratio"])
        for r in pack_stats(packed, 8).collect()
    }
    total = sum(_ntok(t) for _, t, _ in DOCS)
    fills = [f for (_, f, _) in stats.values()]
    assert sum(fills) == total
    assert len(fills) == (total + 7) // 8
    # every window except the single shard-tail (max seq) is exactly full
    tail = max(stats)
    for key, (_, fill, ratio) in stats.items():
        assert fill == (8 if key != tail else total - 8 * (len(fills) - 1))
        assert ratio == round(fill / 8.0, 6)


def test_pack_piece_offsets_reassemble(spark, docs_df):
    """Pieces of each doc are contiguous, disjoint, and cover [0, n)."""
    packed = pack_sequences(docs_df, 6, n_shards=2).collect()
    by_doc = {}
    for r in packed:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["shard"], r["seq"], r["piece_start"], r["piece_len"])
        )
    for did, text, _ in DOCS:
        n = _ntok(text)
        if n == 0:
            assert did not in by_doc
            continue
        pieces = sorted(by_doc[did], key=lambda p: p[2])
        assert pieces[0][2] == 0
        off = 0
        for sh, seq, ps, pl in pieces:
            assert ps == off and pl >= 1
            off += pl
        assert off == n
        # consecutive pieces land in consecutive windows of one shard
        assert len({sh for sh, *_ in pieces}) == 1
        seqs = [seq for _, seq, *_ in pieces]
        assert seqs == list(range(seqs[0], seqs[0] + len(seqs)))


def ref_chunks(docs, chunk, stride):
    rows = []
    for did, text, _ in docs:
        toks = text.strip().split() if text.strip() else []
        n = len(toks)
        for s in range(0, n, stride):
            if s != 0 and n - s + stride <= chunk:
                continue
            piece = toks[s : s + chunk]
            rows.append((did, s // stride, s, len(piece), " ".join(piece)))
    return sorted(rows)


@pytest.mark.parametrize("chunk,stride", [(4, 4), (4, 2), (10, 3), (1, 1)])
def test_chunk_documents_matches_reference(spark, docs_df, chunk, stride):
    got = sorted(
        tuple(r) for r in chunk_documents(docs_df, chunk, stride).collect()
    )
    assert got == ref_chunks(DOCS, chunk, stride)


def test_chunk_no_fully_contained_windows(spark, docs_df):
    for r in chunk_documents(docs_df, 6, 2).collect():
        # each chunk must extend past the previous window's end
        if r["start"] != 0:
            prev_end = r["start"] - 2 + 6
            assert r["start"] + r["chunk_len"] > prev_end


def test_mixture_weights(spark, docs_df):
    targets = {"s0": 0.5, "s2": 0.5}
    rows = {r["source"]: r for r in mixture_weights(docs_df, targets).collect()}
    ntok = {}
    for _, text, src in DOCS:
        ntok[src] = ntok.get(src, 0) + _ntok(text)
    total = sum(ntok.values())
    for src, r in rows.items():
        assert r["n_tokens"] == ntok[src]
        assert r["token_share"] == round(ntok[src] / total, 6)
        tgt = targets.get(src, 0.0)
        assert r["target_share"] == round(tgt, 6)
        assert r["weight"] == pytest.approx(tgt / (ntok[src] / total), abs=1e-6)
    assert rows["s1"]["weight"] == 0.0


def ref_sample(docs, weights, seed, mod):
    rows = []
    for did, _text, src in docs:
        w = weights.get(src, 0.0)
        nf = int(math.floor(w))
        th = int(math.floor((w - nf) * mod))
        draw = _hash60(f"{did}|{seed}") % mod
        n = nf + (1 if draw < th else 0)
        rows.extend((did, src, e) for e in range(1, n + 1))
    return sorted(rows)


@pytest.mark.parametrize(
    "weights",
    [
        {"s0": 0.5, "s1": 2.25, "s2": 1.0},
        {"s0": 0.0, "s1": 3.0},
        {"s2": 0.999999},
    ],
)
def test_mixture_sample_matches_reference(spark, docs_df, weights):
    got = sorted(
        tuple(r)
        for r in mixture_sample(docs_df, weights, seed=7, mod=1000).collect()
    )
    assert got == ref_sample(DOCS, weights, 7, 1000)


def test_mixture_sample_determinism_and_epochs(spark, docs_df):
    w = {"s0": 2.5, "s1": 0.5, "s2": 1.5}
    a = sorted(tuple(r) for r in mixture_sample(docs_df, w).collect())
    b = sorted(tuple(r) for r in mixture_sample(docs_df, w).collect())
    assert a == b
    # every kept doc has contiguous epochs 1..n
    by_doc = {}
    for did, src, e in a:
        by_doc.setdefault(did, []).append(e)
    for eps in by_doc.values():
        assert sorted(eps) == list(range(1, len(eps) + 1))


def test_validation_errors(spark, docs_df):
    with pytest.raises(ValueError):
        pack_sequences(docs_df, 0)
    with pytest.raises(ValueError):
        pack_sequences(docs_df, 8, n_shards=0)
    with pytest.raises(ValueError):
        chunk_documents(docs_df, 0, 1)
    with pytest.raises(ValueError):
        chunk_documents(docs_df, 4, 0)
    with pytest.raises(ValueError):
        mixture_sample(docs_df, {"s0": -0.5})
    with pytest.raises(ValueError):
        mixture_sample(docs_df, {"s0": 1.0}, mod=0)


def test_pack_single_exchange_plan(spark, docs_df):
    """The packing plan's only exchange is the hash partition by shard
    (plus AQE-less single-partition test session artifacts): no global
    single-partition sort, no cartesian."""
    plan = pack_sequences(docs_df, 8, n_shards=4)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # No global single-partition sort/exchange anywhere upstream of the
    # one shard hash-partition exchange.
    assert "Exchange hashpartitioning" in plan
    before_shard = plan.split("Exchange hashpartitioning")[0]
    assert "SinglePartition" not in before_shard
    assert plan.count("Exchange") == 1


def test_rowlocal_zero_shuffle_plans(spark, docs_df):
    for df in (
        chunk_documents(docs_df, 4, 2),
        mixture_sample(docs_df, {"s0": 1.5}),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "CartesianProduct" not in plan
