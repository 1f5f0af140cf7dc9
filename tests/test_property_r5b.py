"""Hypothesis property tests for the window-boundary and hash-draw
kernels of the packing/curation family — the same treatment the walk
and interval kernels got in ``test_property_r5.py``:

- ``pack_sequences``: the concat-and-split window arithmetic (shard
  hash, within-shard cumsum, ``floor(start/b)..floor((cum-1)/b)``
  window enumeration, clipped piece offsets) must equal a pure-Python
  mirror of the same integer math — including documents of EXACTLY
  ``budget`` tokens (a window boundary lands between two docs),
  documents spanning many windows, ``budget=1``, zero-token documents
  (dropped), and single-shard layouts where every doc shares a cumsum
  chain.
- ``mixture_sample``: ``n_copies = floor(w) + [h60(id|seed) % mod <
  floor(frac(w)·mod)]`` must equal the Python mirror at adversarial
  weights — integral w (threshold 0: the fractional draw must NEVER
  fire), w < 1 down-sampling, w just under an integer
  (``2.999999``), and weight-0 / absent sources (dropped).
- ``dataset_split``: the cumulative-bucket cut ``h60(id|seed) %
  Σweights`` against insertion-order boundaries must equal the
  mirror for arbitrary positive integer weights, including
  single-split and weight-1 slivers.

Example counts are small (each example runs Spark jobs); generators
favor boundary shapes (token counts pinned near budget multiples,
weights pinned near integers).
"""

import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from grandiso_networkx_spark.operators.curation import dataset_split
from grandiso_networkx_spark.operators.packing import (
    mixture_sample,
    pack_sequences,
)

PROP_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# -- pack_sequences window arithmetic ---------------------------------------

# token counts 0..9 with budgets 1..5: many docs land exactly ON a
# window boundary; 0-token docs must vanish from the layout entirely
PACK_DOCS = st.lists(st.integers(0, 9), min_size=1, max_size=10)


def _py_pack(doc_tokens, budget, n_shards):
    """Pure-Python mirror of pack_sequences' layout math."""
    by_shard: dict[int, list[tuple[str, int]]] = {}
    for doc_id, n in doc_tokens:
        if n <= 0:
            continue
        by_shard.setdefault(_h60(doc_id) % n_shards, []).append((doc_id, n))
    out = []
    for shard, docs in by_shard.items():
        cum = 0
        for doc_id, n in sorted(docs):
            start, cum = cum, cum + n
            for seq in range(start // budget, (cum - 1) // budget + 1):
                lo, hi = seq * budget, (seq + 1) * budget
                out.append(
                    (
                        shard,
                        seq,
                        doc_id,
                        max(lo - start, 0),
                        min(cum, hi) - max(start, lo),
                    )
                )
    return sorted(out)


class TestPackSequencesLayout:
    @settings(**PROP_SETTINGS)
    @given(tokens=PACK_DOCS, budget=st.integers(1, 5), n_shards=st.sampled_from([1, 2, 4]))
    def test_matches_python_mirror(self, spark, tokens, budget, n_shards):
        doc_tokens = [(f"d{i:03d}", n) for i, n in enumerate(tokens)]
        docs = spark.createDataFrame(
            [(d, " ".join(["w"] * n) if n else "") for d, n in doc_tokens],
            "doc_id string, text string",
        )
        got = sorted(
            tuple(r)
            for r in pack_sequences(
                docs, budget=budget, n_shards=n_shards
            ).collect()
        )
        assert got == _py_pack(doc_tokens, budget, n_shards)

    def test_exact_budget_doc_fills_one_window(self, spark):
        # Three docs of exactly `budget` tokens: each fills its own
        # window with piece_start 0 — no window straddles a doc.
        budget = 4
        docs = spark.createDataFrame(
            [(f"d{i}", " ".join(["w"] * budget)) for i in range(3)],
            "doc_id string, text string",
        )
        rows = pack_sequences(docs, budget=budget, n_shards=1).collect()
        assert len(rows) == 3
        assert all(r.piece_start == 0 and r.piece_len == budget for r in rows)
        assert sorted(r.seq for r in rows) == [0, 1, 2]


# -- mixture_sample threshold draw ------------------------------------------

# weights pinned around integers: the frac·mod threshold must be exact
MIX_WEIGHTS = st.lists(
    st.sampled_from([0.0, 0.25, 0.5, 1.0, 1.75, 2.0, 2.999999]),
    min_size=1,
    max_size=3,
)


def _py_mixture(doc_rows, weights, seed, mod):
    out = []
    for doc_id, source in doc_rows:
        w = weights.get(source, 0.0)
        nf = int(math.floor(w))
        th = int(math.floor((w - nf) * mod))
        draw = _h60(f"{doc_id}|{seed}") % mod
        copies = nf + (1 if draw < th else 0)
        out.extend((doc_id, source, e) for e in range(1, copies + 1))
    return sorted(out)


class TestMixtureSampleThreshold:
    @settings(**PROP_SETTINGS)
    @given(ws=MIX_WEIGHTS, seed=st.integers(0, 3))
    def test_matches_python_mirror(self, spark, ws, seed):
        weights = {f"s{i}": w for i, w in enumerate(ws)}
        # include a source absent from weights: always dropped
        doc_rows = [
            (f"d{j:02d}", f"s{j % (len(ws) + 1)}") for j in range(20)
        ]
        docs = spark.createDataFrame(doc_rows, "doc_id string, source string")
        got = sorted(
            tuple(r) for r in mixture_sample(docs, weights, seed=seed).collect()
        )
        assert got == _py_mixture(doc_rows, weights, seed, 1_000_000)

    def test_integral_weight_never_draws_fractional_copy(self, spark):
        # w = 2.0 → threshold 0 → EVERY doc gets exactly 2 epochs; a
        # lossy `<=` (or a frac threshold of mod) would give some 3.
        docs = spark.createDataFrame(
            [(f"d{j}", "a") for j in range(50)], "doc_id string, source string"
        )
        counts = (
            mixture_sample(docs, {"a": 2.0})
            .groupBy("doc_id")
            .count()
            .collect()
        )
        assert len(counts) == 50 and all(r["count"] == 2 for r in counts)


# -- dataset_split bucket boundaries ----------------------------------------

SPLIT_WEIGHTS = st.lists(st.integers(1, 5), min_size=1, max_size=4)


def _py_split(ids, weights, seed):
    mod = sum(weights.values())
    names = list(weights)
    out = {}
    for i in ids:
        b = _h60(f"{i}|{seed}") % mod
        cum = 0
        label = names[-1]
        for name in names[:-1]:
            cum += weights[name]
            if b < cum:
                label = name
                break
        out[i] = label
    return out


class TestDatasetSplitBuckets:
    @settings(**PROP_SETTINGS)
    @given(ws=SPLIT_WEIGHTS, seed=st.integers(0, 3))
    def test_matches_python_mirror(self, spark, ws, seed):
        weights = {f"p{i}": w for i, w in enumerate(ws)}
        ids = [f"doc{j:03d}" for j in range(40)]
        df = spark.createDataFrame([(i,) for i in ids], "doc_id string")
        got = {
            r.doc_id: r.split
            for r in dataset_split(df, weights, seed=seed).collect()
        }
        assert got == _py_split(ids, weights, seed)

    def test_single_split_takes_everything(self, spark):
        df = spark.createDataFrame(
            [(f"d{j}",) for j in range(10)], "doc_id string"
        )
        rows = dataset_split(df, {"train": 3}).collect()
        assert len(rows) == 10 and all(r.split == "train" for r in rows)
