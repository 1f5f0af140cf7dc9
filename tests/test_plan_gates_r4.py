"""Round-4 plan-shape gates (VERDICT r3 "Next round" item 1): BPE at
production merge budgets.

- ``bpe_encode``'s segmented chain: each ``checkpoint_every`` segment
  still plans exactly ONE exchange, and the post-checkpoint segment
  REUSES the checkpointed (doc_id, widx) partitioning — zero fresh
  exchanges after the first segment.
- ``bpe_encode_fast`` is map-only: a single mapInPandas over the scan,
  no exchange at all, plan size constant in the merge count.
"""

from grandiso_networkx_spark.operators.bpe import bpe_encode, bpe_encode_fast


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


_MERGES_8 = [
    ("l", "o"), ("lo", "w"), ("a", "a"), ("aa", "aa"),
    ("e", "s"), ("es", "t"), ("w", "i"), ("wi", "d"),
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, "low lower lowest aaaa widest") for i in range(8)],
        "doc_id long, text string",
    )


def test_bpe_encode_segmented_chain_exchange_count(spark):
    """With checkpoint_every=3 over 8 merges the final visible plan is
    the LAST segment only (2 merge passes over the checkpointed RDD).
    The checkpoint preserves the (doc_id, widx) hash partitioning, so
    that segment plans ZERO exchanges — the whole job runs exactly one
    exchange per materialization boundary, never one per merge."""
    df = bpe_encode(_docs(spark), _MERGES_8, checkpoint_every=3)
    plan = _plan(df)
    assert "Exchange" not in plan, plan
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, plan


def test_bpe_encode_unsegmented_still_single_exchange(spark):
    df = bpe_encode(_docs(spark), _MERGES_8, checkpoint_every=None)
    plan = _plan(df)
    assert plan.count("Exchange") == 1, plan


def test_bpe_encode_segment_plan_depth_bounded(spark):
    """Plan DEPTH is bounded by the segment length, not the merge
    count: the 8-merge checkpoint_every=3 plan must contain at most
    2 merges' worth of window operators (5 per merge pass), while the
    unsegmented plan carries all 8 merges (40 windows)."""
    seg = _plan(bpe_encode(_docs(spark), _MERGES_8, checkpoint_every=3))
    full = _plan(bpe_encode(_docs(spark), _MERGES_8, checkpoint_every=None))
    assert seg.count("Window") <= 2 * 5, seg
    assert full.count("Window") > seg.count("Window"), (full, seg)


def test_bpe_encode_fast_map_only(spark):
    """The vectorized encode twin shuffles NOTHING: one mapInPandas
    over the documents scan, no Exchange, no Window, no join — and the
    plan is the same size at 1 merge and at 64 merges."""
    docs = _docs(spark)
    p1 = _plan(bpe_encode_fast(docs, _MERGES_8[:1]))
    p64 = _plan(bpe_encode_fast(docs, _MERGES_8 * 8))
    for plan in (p1, p64):
        assert "Exchange" not in plan, plan
        assert "Window" not in plan, plan
        assert "MapInPandas" in plan, plan
    assert len(p64) == len(p1), (len(p1), len(p64))


def test_pagerank_auto_kernel_resolves_and_matches(spark):
    """kernel='auto' probes both scatter backends on live rounds and
    must (a) append exactly one resolved name, (b) produce the same
    ranks as an explicit-jvm run (kernel choice changes execution
    strategy only; per-edge arithmetic is identical)."""
    from grandiso_networkx_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 40) for i in range(40)]
        + [(i, (i + 1) % 40) for i in range(40)],
        "src long, dst long",
    )
    kc: list = []
    auto = {
        r["id"]: r["rank"]
        for r in pagerank(
            edges,
            fixed_iterations=6,
            kernel="auto",
            unroll=1,
            kernel_choice=kc,
        ).collect()
    }
    assert kc and kc[0] in ("jvm", "arrow"), kc
    jvm = {
        r["id"]: r["rank"]
        for r in pagerank(
            edges, fixed_iterations=6, kernel="jvm", unroll=1
        ).collect()
    }
    assert auto.keys() == jvm.keys()
    for k in jvm:
        assert abs(auto[k] - jvm[k]) < 1e-9, k


def test_pagerank_auto_kernel_falls_back_on_unroll(spark):
    """auto + windowed unroll resolves to jvm immediately."""
    from grandiso_networkx_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(
        [(i, (i + 1) % 10) for i in range(10)], "src long, dst long"
    )
    kc: list = []
    pagerank(
        edges, fixed_iterations=4, kernel="auto", unroll=2, kernel_choice=kc
    ).collect()
    assert kc == ["jvm"]


def test_lsh_pair_generators_never_broadcast_corpus_sides(spark):
    """MinHash band joins, signature re-attach joins, and embedding
    bucket joins must never broadcast-build a corpus-derived side:
    Catalyst's size estimate is array-blind there, and a broadcast
    build computes the whole signature pass inside the 300s broadcast
    thread (both failure modes observed live at 700k docs).  The
    query-side broadcast in lsh_bucketed_topk is legitimate (probe
    sets are small) and stays."""
    from grandiso_networkx_spark.operators.dedup import minhash_lsh_pairs
    from grandiso_networkx_spark.operators.similarity import (
        embedding_near_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"text number {i} alpha beta gamma") for i in range(30)],
        "doc_id long, text string",
    )
    plan = (
        minhash_lsh_pairs(docs, num_perm=8, bands=4, threshold=0.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" not in plan, plan
    emb = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5), 1.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    plan2 = (
        embedding_near_pairs(emb, dim=3, threshold=0.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" not in plan2, plan2
