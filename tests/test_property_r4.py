"""Hypothesis property tests for the round-4 dedup/similarity kernels
(VERDICT r3 item 6), each against a pure-Python brute-force mirror on
random corpora:

- MinHash + LSH banding: the portable signature is replayed hash-exact
  (md5-affine mins), and ``minhash_lsh_pairs`` == brute force over the
  signature matrix — the banding invariant (a pair is emitted iff the
  signatures agree on some full band AND the estimated Jaccard clears
  the threshold) with no candidate misses and no phantom pairs.
- Winnowing: the fingerprint set equals the brute-force
  Schleimer/Wilkerson/Aiken window-min rule (min per w-window of
  60-bit k-gram hashes, full windows only, global-min fallback for
  short docs), plus the shared-substring guarantee on constructed
  partial copies.
- Set-similarity prefix filtering: ``setsim_jaccard_pairs`` ==
  all-pairs token-set Jaccard at the threshold — the prefix filter
  loses nothing (completeness) and the verify stage adds nothing.

Example counts are small (each example runs Spark jobs); generators
favor adversarial shapes — repeated texts (ties everywhere), shared
substrings, short docs, whitespace runs.
"""

import hashlib
import re

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from grandiso_networkx_spark.operators.dedup import (
    _portable_params,
    minhash_lsh_pairs,
    portable_minhash_signatures,
    setsim_jaccard_pairs,
)
from grandiso_networkx_spark.operators.textstats import winnow_fingerprints

PROP_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_P31 = (1 << 31) - 1
_WS = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s (ASCII)

# texts over a small alphabet with spaces → heavy shingle/token
# collisions; plus duplicated entries for exact-tie coverage
TEXT = st.text(alphabet="abc d", min_size=0, max_size=24)


def _corpus(draw, min_size=2, max_size=7):
    base = draw(st.lists(TEXT, min_size=min_size, max_size=max_size))
    if len(base) > 1 and draw(st.booleans()):
        base.append(base[0])  # guaranteed exact duplicate pair
    return base


CORPUS = st.composite(_corpus)()


def _md5hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _hash28(s: str) -> int:
    return int(_md5hex(s)[:7], 16)


def _hash60(s: str) -> int:
    return int(_md5hex(s)[:15], 16)


def _shingles(text: str, k: int) -> list[str]:
    """Mirror of _char_shingles: 1..max(len-k+1, 1) substrings of
    length k (the whole text — possibly '' — if shorter)."""
    t = text or ""
    n = max(len(t) - (k - 1), 1)
    return [t[i : i + k] for i in range(n)]


def _ref_signature(text: str, num_perm: int, k: int, seed: int) -> list[int]:
    a, b = _portable_params(num_perm, seed)
    hs = [_hash28(s) for s in _shingles(text, k)]
    return [min((h * ai + bi) % _P31 for h in hs) for ai, bi in zip(a, b)]


@given(docs=CORPUS)
@settings(**PROP_SETTINGS)
def test_portable_minhash_signature_hash_exact(spark, docs):
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: list(r["sig"])
        for r in portable_minhash_signatures(
            df, num_perm=8, shingle_k=3, seed=42
        ).collect()
    }
    want = {
        i: _ref_signature(t, num_perm=8, k=3, seed=42)
        for i, t in enumerate(docs)
    }
    assert got == want


@given(docs=CORPUS, threshold=st.sampled_from([0.0, 0.5, 0.75, 1.0]))
@settings(**PROP_SETTINGS)
def test_minhash_lsh_pairs_match_bruteforce(spark, docs, threshold):
    """Emitted pairs == {(a,b): some band agrees AND est >= t} over the
    replayed signature matrix — banding misses nothing it shouldn't
    and emits nothing extra."""
    num_perm, bands, k = 8, 4, 3
    rows = num_perm // bands
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        (r["a"], r["b"]): round(r["est_jaccard"], 6)
        for r in minhash_lsh_pairs(
            df,
            num_perm=num_perm,
            bands=bands,
            shingle_k=k,
            threshold=threshold,
        ).collect()
    }
    sig = {
        i: _ref_signature(t, num_perm, k, seed=42)
        for i, t in enumerate(docs)
    }
    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            sa, sb = sig[a], sig[b]
            banded = any(
                sa[i * rows : (i + 1) * rows] == sb[i * rows : (i + 1) * rows]
                for i in range(bands)
            )
            est = sum(x == y for x, y in zip(sa, sb)) / num_perm
            if banded and est >= threshold:
                want[(a, b)] = round(est, 6)
    assert got == want


def _ref_winnow(text: str, k: int, w: int) -> set[int]:
    t = _WS.sub(" ", (text or "").strip(" ").lower())
    if len(t) < k:
        return set()
    hs = [_hash60(t[i : i + k]) for i in range(len(t) - k + 1)]
    ng = len(hs)
    return {
        min(hs[p : p + w]) for p in range(max(ng - w + 1, 1))
    }


@given(docs=CORPUS, w=st.sampled_from([1, 2, 4]))
@settings(**PROP_SETTINGS)
def test_winnow_fingerprints_match_bruteforce(spark, docs, w):
    k = 4
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    want = {
        i: fps
        for i, t in enumerate(docs)
        if (fps := _ref_winnow(t, k, w))
    }
    assert got == want


def test_winnow_shared_substring_guarantee(spark):
    """Any shared substring of length >= k + w - 1 must yield at least
    one shared fingerprint (the MOSS guarantee) — construct partial
    copies around a common core and check overlap."""
    k, w = 4, 3
    core = "thequickbrownfox"  # len 16 >= k + w - 1 = 6
    docs = [
        (0, "aaaa" + core + "bbbb"),
        (1, "zzzzzz" + core),
        (2, core + "qqqq"),
        (3, "unrelatedtextwithoutthecore"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps: dict[int, set[int]] = {i: set() for i, _ in docs}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        fps[r["doc_id"]].add(r["fp"])
    for a in (0, 1, 2):
        for b in (0, 1, 2):
            if a < b:
                assert fps[a] & fps[b], (a, b)


def _ref_setsim(docs: list[str], threshold: float) -> dict:
    toks = [
        set(_WS.split((t or "").strip(" ").lower())) for t in docs
    ]
    out = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            ni = len(toks[a] & toks[b])
            nu = len(toks[a] | toks[b])
            if nu and ni / nu >= threshold:
                out[(a, b)] = round(ni / nu, 6)
    return out


@given(docs=CORPUS, threshold=st.sampled_from([0.3, 0.5, 0.8, 1.0]))
@settings(**PROP_SETTINGS)
def test_setsim_prefix_filter_complete(spark, docs, threshold):
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        (r["a"], r["b"]): round(r["jaccard"], 6)
        for r in setsim_jaccard_pairs(df, threshold=threshold).collect()
    }
    assert got == _ref_setsim(docs, threshold)
