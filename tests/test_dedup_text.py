"""Training-data ops: dedup, text stats, similarity search."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from grandiso_networkx_spark.operators import dedup, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumped over the lazy dog"),  # near dup
        (3, "le renard brun rapide saute par dessus le chien"),
        (4, "der schnelle braune fuchs springt und der hund"),
        (5, "completely unrelated text about spark engines"),
        (6, ""),
        (7, "  "),
        (8, "el zorro y los perros y el gato"),
        (9, "numbers 123 456 789 !!! ??? ..."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestExactDedup:
    def test_groups(self, spark, docs):
        got = {r.keep_id: r.n_dups for r in dedup.exact_duplicates(docs).collect()}
        assert got[0] == 2  # docs 0 and 1
        assert sum(got.values()) == 10
        kept = dedup.dedup_exact(docs)
        assert kept.count() == 9
        assert kept.where(F.col("doc_id") == 1).count() == 0


class TestNearDedupKeep:
    def test_transitive_clusters_and_untouched_docs(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6)], "a long, b long"
        )
        got = {
            r.doc_id: (r.keep_id, r.is_dup)
            for r in dedup.near_dedup_keep(docs, pairs).collect()
        }
        assert got == {
            1: (1, False),
            2: (1, True),
            3: (1, True),  # transitive: 1≈2, 2≈3 ⇒ same cluster
            4: (4, False),  # never paired: keeps itself
            5: (5, False),
            6: (5, True),
        }

    def test_composes_with_winnowing_pairs(self, spark, docs):
        pairs = textstats.winnow_near_pairs(docs, k=6, w=3, min_shared=2)
        out = dedup.near_dedup_keep(docs, pairs)
        assert out.count() == docs.count()  # every doc decided
        by_id = {r.doc_id: r for r in out.collect()}
        # keep_id is always the min of its own cluster: a kept doc is
        # its own representative, and no keep_id exceeds its doc_id.
        for r in by_id.values():
            assert r.keep_id <= r.doc_id
            assert by_id[r.keep_id].is_dup is False


class TestMinhash:
    def test_exact_dups_have_jaccard_one(self, spark, docs):
        pairs = {
            (r.a, r.b): r.est_jaccard
            for r in dedup.minhash_lsh_pairs(docs, threshold=0.0).collect()
        }
        assert pairs.get((0, 1)) == 1.0
        # near dup scores high, unrelated pair absent or low
        assert pairs.get((0, 2), 0.0) > 0.5
        assert pairs.get((0, 5), 0.0) < 0.5

    def test_signatures_deterministic(self, spark, docs):
        a = dedup.minhash_signatures(docs).orderBy("doc_id").collect()
        b = dedup.minhash_signatures(docs).orderBy("doc_id").collect()
        assert [r.sig for r in a] == [r.sig for r in b]

    def test_vectorized_kernel_matches_reference_loop(self, spark, docs):
        """The batch-vectorized numpy kernel (ragged reduceat over a
        concatenated byte buffer) must equal a trivially-correct
        per-document Python recomputation of the same hash family."""
        num_perm, k, seed = 16, 5, 7
        got = {
            r.doc_id: list(r.sig)
            for r in dedup.minhash_signatures(
                docs, num_perm=num_perm, shingle_k=k, seed=seed
            ).collect()
        }
        P = (1 << 31) - 1
        rng = np.random.RandomState(seed)
        a = [int(x) for x in rng.randint(1, P, size=num_perm)]
        b = [int(x) for x in rng.randint(0, P, size=num_perm)]
        for row in docs.collect():
            t = (row.text or "").ljust(k, "\x00").encode("utf-8")
            hs = set()
            for i in range(len(t) - k + 1):
                h = 0
                for byte in t[i : i + k]:
                    h = (h * 1000003 + byte) % (1 << 64)
                hs.add(h % P)
            want = [
                min((ai * h + bi) % P for h in hs)
                for ai, bi in zip(a, b)
            ]
            assert got[row.doc_id] == want, f"doc {row.doc_id}"


class TestSimhash:
    def test_exact_dups_collide(self, spark, docs):
        got = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
        assert got[0] == got[1]
        ham = bin((got[0] ^ got[2]) & ((1 << 64) - 1)).count("1")
        assert ham <= 12  # near dup → small hamming distance
        pairs = {(r.a, r.b) for r in dedup.simhash_near_pairs(docs, max_hamming=12).collect()}
        assert (0, 1) in pairs


class TestNgramJaccard:
    def test_pairs(self, spark, docs):
        got = {
            (r.a, r.b): r.jaccard
            for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
        }
        assert got[(0, 1)] == 1.0
        assert 0.3 <= got[(0, 2)] < 1.0
        assert (0, 5) not in got

    def test_max_df_stop_gram_guard(self, spark):
        # 6 docs all sharing the boilerplate header gram; two true dups.
        boiler = "terms of service apply here"
        rows = [(i, f"{boiler} document body number {i}") for i in range(4)]
        rows += [(10, f"{boiler} same exact body text"),
                 (11, f"{boiler} same exact body text")]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        # Unguarded: every pair shares the boilerplate grams → all
        # C(6,2)=15 pairs surface at threshold 0.
        full = dedup.ngram_jaccard_pairs(d, n=3, threshold=0.0, max_df=None)
        assert full.count() == 15
        # Guarded at max_df=2: grams in >2 docs (the boilerplate) are
        # dropped from sizes AND intersections — only the true dup
        # pair's body grams survive, and its Jaccard over the filtered
        # sets is exactly 1.0.
        guarded = {
            (r.a, r.b): r.jaccard
            for r in dedup.ngram_jaccard_pairs(
                d, n=3, threshold=0.0, max_df=2
            ).collect()
        }
        assert guarded[(10, 11)] == 1.0
        assert all(a == 10 and b == 11 for (a, b) in guarded)


class TestTextStats:
    def test_token_count(self, spark, docs):
        got = {
            r.doc_id: r.n
            for r in docs.select(
                "doc_id", textstats.token_count(F.col("text")).alias("n")
            ).collect()
        }
        assert got[0] == 9
        assert got[6] == 0 and got[7] == 0

    def test_lang_guess(self, spark, docs):
        got = {r.doc_id: r.lang_guess for r in textstats.language_guess(docs).collect()}
        assert got[0] == "en"
        assert got[3] == "fr"
        assert got[4] == "de"
        assert got[8] == "es"
        assert got[6] == "und"

    def test_quality_and_fingerprint(self, spark, docs):
        q = {r.doc_id: r for r in textstats.quality_features(docs).collect()}
        assert q[9].digit_ratio > 0.2
        assert q[9].punct_ratio > 0.2
        assert q[0].stopword_ratio > 0.2
        fp = {r.doc_id: r.fp for r in textstats.fingerprint(docs).collect()}
        assert fp[0] == fp[1]
        assert fp[6] == fp[7]  # whitespace-normalized
        assert fp[0] != fp[2]


class TestWinnowing:
    def test_guarantee_and_partial_copy(self, spark):
        # winnowing guarantee: a shared substring of length >= k+w-1
        # yields at least one shared fingerprint
        shared = "this exact sentence is lifted verbatim from doc zero"
        rows = [
            (0, "intro words then " + shared + " and then an ending"),
            (1, "totally different framing yet " + shared + " appears here"),
            (2, "no overlap with the others whatsoever in any words"),
            (3, ""),
            (4, "tiny"),  # shorter than k=8 after norm → no fingerprints
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        fps = textstats.winnow_fingerprints(docs, k=8, w=4).collect()
        by_doc = {}
        for r in fps:
            by_doc.setdefault(r.doc_id, set()).add(r.fp)
        assert by_doc[0] & by_doc[1]  # partial copy detected
        assert not (by_doc[0] & by_doc[2]) or len(by_doc[0] & by_doc[2]) < 2
        assert 3 not in by_doc and 4 not in by_doc
        # deterministic
        again = textstats.winnow_fingerprints(docs, k=8, w=4).collect()
        assert {(r.doc_id, r.fp) for r in fps} == {(r.doc_id, r.fp) for r in again}

    def test_near_pairs_detect_partial_copy(self, spark):
        shared = "this exact sentence is lifted verbatim from doc zero"
        rows = [
            (0, "intro words then " + shared + " and then an ending"),
            (1, "totally different framing yet " + shared + " appears here"),
            (2, "no overlap with the others whatsoever in any words"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = {
            (r.a, r.b): r.shared_fps
            for r in textstats.winnow_near_pairs(
                docs, k=8, w=4, min_shared=2
            ).collect()
        }
        assert (0, 1) in pairs and pairs[(0, 1)] >= 2
        assert (0, 2) not in pairs and (1, 2) not in pairs
        # stop-fingerprint guard: max_df=1 drops every fp shared by 2+
        # docs, so no pair can form
        none = textstats.winnow_near_pairs(
            docs, k=8, w=4, min_shared=1, max_df=1
        ).collect()
        assert none == []

    def test_short_doc_emits_global_min(self, spark):
        # 9 chars, k=8 → 2 k-grams < w windows → exactly one fp (the min)
        docs = spark.createDataFrame([(0, "abcdefghi")], "doc_id long, text string")
        fps = textstats.winnow_fingerprints(docs, k=8, w=4).collect()
        assert len(fps) == 1


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        rng = np.random.RandomState(7)
        base = rng.standard_normal((40, 16)).astype(np.float32)
        base[1] = base[0] + 0.01 * rng.standard_normal(16).astype(np.float32)
        rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_bruteforce_topk(self, spark, emb):
        got = similarity.cosine_topk(emb, emb.where(F.col("vec_id") == 0), k=3).collect()
        assert got[0].vec_id == 1 and got[0].cosine > 0.99
        assert len(got) == 3

    def test_lsh_recall_of_near_neighbor(self, spark, emb):
        got = similarity.lsh_bucketed_topk(
            emb, emb.where(F.col("vec_id") == 0), dim=16, k=3, bits=6, tables=6
        ).collect()
        assert any(r.vec_id == 1 for r in got)  # near-identical vector found
        # approx results are a subset of candidates with exact rerank
        assert all(-1.0 <= r.cosine <= 1.0 for r in got)

    def test_ivf_full_probe_equals_bruteforce(self, spark, emb):
        qs = emb.where(F.col("vec_id") < 4)
        exact = {
            (r.query_id, r.vec_id, r.cosine)
            for r in similarity.cosine_topk(emb, qs, k=5).collect()
        }
        full_probe = {
            (r.query_id, r.vec_id, r.cosine)
            for r in similarity.ivf_topk(
                emb, qs, k=5, n_centroids=4, nprobe=4, lloyd_iters=1
            ).collect()
        }
        assert full_probe == exact  # probing every list == brute force

    def test_ivf_partial_probe_finds_near_neighbor(self, spark, emb):
        got = similarity.ivf_topk(
            emb,
            emb.where(F.col("vec_id") == 0),
            k=3,
            n_centroids=4,
            nprobe=2,
            lloyd_iters=1,
        ).collect()
        # vec 1 is near-identical to vec 0 → same cluster → found
        assert any(r.vec_id == 1 and r.cosine > 0.99 for r in got)

    def test_exact_cosine_pairs(self, spark, emb):
        got = similarity.cosine_pairs_exact(emb, threshold=0.95).collect()
        assert {(r.a, r.b) for r in got} == {(0, 1)}  # the planted near-dup
        assert all(r.a < r.b for r in got)

    def test_lsh_near_pairs_find_planted_dups(self, spark, emb):
        # plant 5 near-dup pairs on top of the base fixture
        import numpy as np

        rng = np.random.RandomState(11)
        base = np.array(
            [r.embedding for r in emb.orderBy("vec_id").collect()], dtype=np.float32
        )
        rows = [(i, [float(x) for x in base[i]]) for i in range(len(base))]
        for j in range(5):
            dup = base[2 * j] + 0.01 * rng.standard_normal(16).astype(np.float32)
            rows.append((100 + j, [float(x) for x in dup]))
        big = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

        exact = {
            (r.a, r.b)
            for r in similarity.cosine_pairs_exact(big, threshold=0.95).collect()
        }
        approx = {
            (r.a, r.b)
            for r in similarity.embedding_near_pairs(
                big, dim=16, threshold=0.95, bits=6, tables=6
            ).collect()
        }
        assert approx <= exact  # exact cosine filter: no false positives
        assert len(exact) >= 5
        # multi-table sign-LSH recall on near-identical vectors
        assert len(approx) / len(exact) >= 0.8


class TestSetsimJaccardPairs:
    def _brute(self, docs):
        """All-pairs token-set Jaccard via a deliberate cross join."""
        toks = docs.select(
            "doc_id",
            F.array_distinct(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("ts"),
        )
        a = toks.select(
            F.col("doc_id").alias("a"), F.col("ts").alias("ta")
        )
        b = toks.select(
            F.col("doc_id").alias("b"), F.col("ts").alias("tb")
        )
        return (
            a.crossJoin(b)
            .where(F.col("a") < F.col("b"))
            .select(
                "a",
                "b",
                (
                    F.size(F.array_intersect("ta", "tb"))
                    / F.size(F.array_union("ta", "tb"))
                ).alias("jaccard"),
            )
        )

    def test_matches_brute_force_exactly(self, spark):
        rows = [
            (0, "alpha beta gamma delta epsilon"),
            (1, "alpha beta gamma delta zeta"),       # J=2/3 vs 0
            (2, "alpha beta gamma delta epsilon"),    # exact dup of 0
            (3, "one two three four five six"),
            (4, "one two three four five seven"),     # J=5/7 vs 3
            (5, "totally different words here now"),
            (6, "Alpha  BETA gamma delta epsilon"),   # case/space-normalized dup of 0
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        for t in (0.5, 0.66, 0.9):
            got = {
                (r.a, r.b, round(r.jaccard, 9))
                for r in dedup.setsim_jaccard_pairs(docs, threshold=t).collect()
            }
            want = {
                (r.a, r.b, round(r.jaccard, 9))
                for r in self._brute(docs).where(F.col("jaccard") >= t).collect()
            }
            assert got == want
        full = {
            (r.a, r.b)
            for r in dedup.setsim_jaccard_pairs(docs, threshold=0.99).collect()
        }
        assert full == {(0, 2), (0, 6), (2, 6)}

    def test_prefix_filter_lossless_on_random_corpus(self, spark):
        import random

        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(40)]
        rows = []
        for i in range(60):
            n = rng.randint(3, 12)
            rows.append((i, " ".join(rng.sample(vocab, n))))
        # plant shifted near-dups
        for j in range(10):
            base = rows[j][1].split()
            base[0] = "w39"
            rows.append((100 + j, " ".join(base)))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r.a, r.b)
            for r in dedup.setsim_jaccard_pairs(docs, threshold=0.6).collect()
        }
        want = {
            (r.a, r.b)
            for r in self._brute(docs).where(F.col("jaccard") >= 0.6).collect()
        }
        assert got == want
        assert len(want) >= 10  # the planted near-dups are above 0.6
