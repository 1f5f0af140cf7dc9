"""Round-3 plan-shape gates (VERDICT r2 "Next round" item 1): the two
remaining single-partition global sorts are gone.

- ``vocab_table`` must TakeOrdered-limit to ``max_vocab`` BEFORE its
  ranking window, so the one-partition window ranks ``max_vocab``
  rows, never the full vocabulary.
- ``link_training_pairs``'s dense vertex index must rank WITHIN
  range partitions (row_number partitioned by the partition id) with
  broadcast per-partition offsets — no global single-partition sort
  of the vertex set.
"""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_vocab_table_limits_before_ranking_window(spark):
    from grandiso_networkx_spark.operators.tokenize import vocab_table

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(10)],
        "doc_id long, text string",
    )
    plan = _plan(vocab_table(docs, max_vocab=4))
    # The global ordering is a TakeOrdered (per-partition top-V +
    # merge), never a full sort:
    assert "TakeOrderedAndProject" in plan, plan
    # ... and it runs BELOW (= before) the ranking window's
    # single-partition exchange, so the window sees only max_vocab
    # rows.  In the plan tree children print after parents, so the
    # TakeOrdered must appear after the exchange line.
    if "Exchange SinglePartition" in plan:
        assert plan.index("TakeOrderedAndProject") > plan.index(
            "Exchange SinglePartition"
        ), plan


def test_dense_vertex_index_parallel_ranking(spark):
    from grandiso_networkx_spark.operators.sampling import (
        _dense_vertex_index,
    )

    verts = spark.createDataFrame(
        [(str(i),) for i in range(40)], "id string"
    )
    idx = _dense_vertex_index(verts, 4)
    plan = _plan(idx)
    # The rank window is partitioned by the range-partition id — a
    # parallel window, not a global one:
    assert "row_number" in plan, plan
    rn_line = next(l for l in plan.splitlines() if "row_number" in l)
    assert "__pid" in rn_line, rn_line
    # The per-partition offsets attach via broadcast:
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    # No single-partition exchange between the rank window and its
    # checkpointed scan (the only allowed SinglePartition is the tiny
    # nparts-row offsets branch):
    lines = plan.splitlines()
    rn_i = next(i for i, l in enumerate(lines) if "row_number" in l)
    for l in lines[rn_i:]:
        if "Scan ExistingRDD" in l:
            break
        if "windowspecdefinition" not in l and "row_number" not in l:
            assert "SinglePartition" not in l, plan


def test_lm_quality_buckets_match_ntile_exactly(spark):
    """The parallel-rank bucket formula must be bit-identical to the
    ntile formulation it replaced, for bucket counts that divide the
    corpus evenly and not."""
    from pyspark.sql import Window

    from grandiso_networkx_spark.operators.lmscore import (
        lm_quality_buckets,
        unigram_logprob,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 3} common word") for i in range(23)],
        "doc_id long, text string",
    )
    for k in (2, 3, 5, 23, 40):
        got = {
            r.doc_id: r.bucket
            for r in lm_quality_buckets(docs, n_buckets=k).collect()
        }
        scored = unigram_logprob(docs)
        w = Window.orderBy(F.col("mean_logp").desc(), F.col("doc_id"))
        want = {
            r.doc_id: r.bucket
            for r in scored.select(
                "doc_id", F.ntile(k).over(w).alias("bucket")
            ).collect()
        }
        assert got == want, k


def test_lm_quality_buckets_rank_window_is_partitioned(spark):
    """No single-partition window over the per-document frame: the
    rank window is partitioned by the range-partition id."""
    from grandiso_networkx_spark.operators.lmscore import (
        lm_quality_buckets,
    )

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(10)], "doc_id long, text string"
    )
    plan = _plan(lm_quality_buckets(docs))
    rn_lines = [l for l in plan.splitlines() if "row_number" in l]
    assert rn_lines and all("__pid" in l for l in rn_lines), plan
    assert "ntile" not in plan


def test_bpe_windows_are_word_partitioned(spark):
    """Every window in the BPE merge pass is partitioned by the word
    key — parallel across words, never a global single-partition
    window; no cartesian anywhere."""
    from grandiso_networkx_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(i, "low lower lowest") for i in range(6)],
        "doc_id long, text string",
    )
    df = bpe_encode(docs, [("l", "o"), ("lo", "w")])
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "doc_id" in line and "widx" in line, line


def test_bpe_encode_single_exchange(spark):
    """All chained merge passes share ONE hash partitioning: every
    window's required clustering (doc_id, widx[, derived]) is
    satisfied by the existing (doc_id, widx) partitioning, so the
    whole 4-merge chain plans exactly one exchange."""
    from grandiso_networkx_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(i, "low lower aaaa") for i in range(8)],
        "doc_id long, text string",
    )
    df = bpe_encode(docs, [("l", "o"), ("lo", "w"), ("a", "a"), ("aa", "aa")])
    plan = _plan(df)
    assert plan.count("Exchange") == 1, plan


def test_dense_vertex_index_values(spark):
    """__i is exactly the 1-based global rank by id under any nparts."""
    from grandiso_networkx_spark.operators.sampling import (
        _dense_vertex_index,
    )

    ids = [f"v{i:03d}" for i in range(57)]
    import random

    rnd = random.Random(7)
    shuffled = ids[:]
    rnd.shuffle(shuffled)
    verts = spark.createDataFrame([(i,) for i in shuffled], "id string")
    for nparts in (1, 3, 8, 64):
        got = {
            r["id"]: r["__i"]
            for r in _dense_vertex_index(verts, nparts).collect()
        }
        assert got == {v: i + 1 for i, v in enumerate(ids)}, nparts


def test_link_training_pairs_values_stable(spark):
    """The parallel index yields the identical training pairs as the
    global-sort formulation it replaced (same md5-affine draws against
    the same dense ranks)."""
    from pyspark.sql import Window

    from grandiso_networkx_spark.operators.sampling import (
        link_training_pairs,
    )
    from grandiso_networkx_spark.operators.walks import _hash60

    edges = spark.createDataFrame(
        [(f"u{i}", f"u{(i * 3 + 1) % 11}") for i in range(11)]
        + [("u1", "u5"), ("u2", "u7")],
        "src string, dst string",
    )
    got = {
        (r.src, r.dst, r.label)
        for r in link_training_pairs(edges, neg_per_pos=2).collect()
    }

    # reference replay: global row_number index (the old formulation)
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    idx = verts.select(
        "id", F.row_number().over(Window.orderBy("id")).alias("__i")
    )
    n = idx.count()
    cand = e.select(
        "src",
        "dst",
        F.explode(F.sequence(F.lit(0), F.lit(1))).alias("__k"),
    ).select(
        "src",
        "dst",
        (
            F.pmod(
                _hash60(
                    F.concat_ws(
                        "|", F.col("src"), F.col("dst"), F.col("__k"), F.lit(42)
                    )
                ),
                F.lit(n),
            )
            + 1
        ).cast("int").alias("__i"),
    )
    negs = (
        cand.join(idx, "__i")
        .select("src", F.col("id").alias("neg_dst"))
        .where(F.col("neg_dst") != F.col("src"))
        .dropDuplicates(["src", "neg_dst"])
        .join(
            e.select("src", F.col("dst").alias("neg_dst")),
            ["src", "neg_dst"],
            "left_anti",
        )
        .select("src", F.col("neg_dst").alias("dst"), F.lit(0).alias("label"))
    )
    want = {
        (r.src, r.dst, r.label)
        for r in e.select(
            "src", "dst", F.lit(1).alias("label")
        ).unionByName(negs).collect()
    }
    assert got == want
