"""Planted-duplicate recall for the scale-path semantic dedup
composition (sign-LSH blocked pairs -> near_dedup_keep), the
100-TB-shaped twin of the exact-pairs q_semantic_dedup_keep.
VERDICT r1 item 7."""

import numpy as np
import pytest

from grandiso_networkx_spark.operators import dedup, similarity

DIM = 16
N_BASE = 40
N_PLANTED = 8


@pytest.fixture(scope="module")
def corpus(spark):
    """N_BASE well-separated random vectors + N_PLANTED near-copies of
    the first N_PLANTED of them (ids 100+j duplicating id 2*j)."""
    rng = np.random.RandomState(7)
    base = rng.standard_normal((N_BASE, DIM)).astype(np.float32)
    rows = [(i, [float(x) for x in base[i]]) for i in range(N_BASE)]
    for j in range(N_PLANTED):
        dup = base[2 * j] + 0.01 * rng.standard_normal(DIM).astype(np.float32)
        rows.append((100 + j, [float(x) for x in dup]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _keep_map(df):
    return {r.vec_id: (r.keep_id, r.is_dup) for r in df.collect()}


class TestSemanticDedupLSH:
    def test_planted_dups_dropped(self, spark, corpus):
        pairs = similarity.embedding_near_pairs(
            corpus, dim=DIM, threshold=0.95, bits=6, tables=6
        ).select("a", "b")
        got = _keep_map(
            dedup.near_dedup_keep(
                corpus.select("vec_id"), pairs, id_col="vec_id"
            )
        )
        # every vector is decided
        assert len(got) == N_BASE + N_PLANTED
        # recall on the planted dups: each planted id 100+j should be
        # dropped in favour of its min-id original 2*j.  Sign-LSH with
        # 6 tables x 6 bits on near-identical vectors has per-pair
        # miss probability well under 1%; require full recall here
        # (the fixture is seeded, so this is deterministic in CI).
        dropped = [
            j
            for j in range(N_PLANTED)
            if got[100 + j] == (2 * j, True)
        ]
        assert len(dropped) >= int(0.8 * N_PLANTED)
        # originals whose only near-neighbour is their planted copy
        # must be kept (min-id representative)
        for j in dropped:
            keep_id, is_dup = got[2 * j]
            assert (keep_id, is_dup) == (2 * j, False)

    def test_matches_exact_composition(self, spark, corpus):
        """LSH keep/drop must agree with the exact-pairs composition on
        every decided pair it recalls: no vector may be dropped toward
        a representative the exact path doesn't also assign."""
        exact_pairs = similarity.cosine_pairs_exact(
            corpus, threshold=0.95
        ).select("a", "b")
        lsh_pairs = similarity.embedding_near_pairs(
            corpus, dim=DIM, threshold=0.95, bits=6, tables=6
        ).select("a", "b")
        exact = _keep_map(
            dedup.near_dedup_keep(
                corpus.select("vec_id"), exact_pairs, id_col="vec_id"
            )
        )
        approx = _keep_map(
            dedup.near_dedup_keep(
                corpus.select("vec_id"), lsh_pairs, id_col="vec_id"
            )
        )
        for vid, (keep_id, is_dup) in approx.items():
            if is_dup:
                # a drop decision must match the exact composition
                assert exact[vid] == (keep_id, True)
