"""End-to-end corpus curation (operators/curation.py): stage-by-stage
semantics on planted fixtures."""

import hashlib

import pytest
from pyspark.sql import functions as F

from grandiso_networkx_spark.operators.curation import curate_corpus

EN = "the cat and the dog sat in front of the fire and slept"
FR = "le chat et la bête et le chien et la porte et le mur dorment"
SHORT_EN = "the and of"  # 3 tokens
PUNCTY = "the!!! and??? of;;; it... the!!! and??? of;;; it..."


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stages(spark):
    rows = [
        (1, EN),          # kept
        (2, FR),          # language-filtered
        (3, SHORT_EN),    # too few tokens (min 4)
        (4, EN),          # exact dup of 1 -> dropped (keep min id)
        (5, PUNCTY),      # punct ratio too high
        (6, EN + " again tonight"),  # kept
    ]
    got = {
        r.doc_id
        for r in curate_corpus(
            _docs(spark, rows),
            lang="en",
            min_tokens=4,
            max_punct_ratio=0.1,
        ).collect()
    }
    assert got == {1, 6}


def test_dedup_runs_among_survivors_only(spark):
    # doc 1 is rejected (French); doc 2 has identical text? no — make
    # the rejected doc share text with a survivor: impossible (same
    # text -> same language), so instead pin that the min-id winner is
    # chosen among survivors.
    rows = [(7, EN), (3, EN), (9, EN)]
    got = {
        r.doc_id
        for r in curate_corpus(_docs(spark, rows), lang="en").collect()
    }
    assert got == {3}


def test_hash_sample_deterministic_and_partial(spark):
    rows = [(i, EN + f" number {i} tonight") for i in range(40)]
    df = _docs(spark, rows)
    kw = dict(lang="en", sample_mod=4, sample_keep=3, seed=42)
    a = {r.doc_id for r in curate_corpus(df, **kw).collect()}
    b = {
        r.doc_id
        for r in curate_corpus(df.repartition(5, "text"), **kw).collect()
    }
    assert a == b
    assert 0 < len(a) < 40
    # matches the portable hash rule exactly
    want = {
        i
        for i in range(40)
        if int(hashlib.md5(f"{i}|42".encode()).hexdigest()[:15], 16) % 4 < 3
    }
    assert a == want


def test_sample_args_must_pair(spark):
    with pytest.raises(ValueError):
        curate_corpus(_docs(spark, [(1, EN)]), sample_mod=4)


def test_single_scan_single_shuffle(spark):
    df = _docs(spark, [(1, EN), (2, EN)])
    plan = curate_corpus(df)._jdf.queryExecution().optimizedPlan().toString()
    # row-local stages collapse into one scan; only the dedup window
    # survives as a cross-row operator, with the quality/lang filters
    # pushed below it (they run before the shuffle)
    ops = [ln.strip().lstrip("+- ") for ln in plan.splitlines()]
    assert sum(op.startswith("Window") for op in ops) == 1
    assert sum(op.startswith("LogicalRDD") for op in ops) == 1
    win_at = next(i for i, op in enumerate(ops) if op.startswith("Window"))
    assert any(op.startswith("Filter") for op in ops[win_at + 1 :])


def test_dataset_split_partition_and_determinism(spark):
    from grandiso_networkx_spark.operators.curation import dataset_split

    docs = spark.createDataFrame(
        [(f"doc{i}",) for i in range(500)], "doc_id string"
    )
    out = {r.doc_id: r.split for r in dataset_split(docs).collect()}
    # exhaustive + exclusive: every doc gets exactly one of the names
    assert set(out) == {f"doc{i}" for i in range(500)}
    assert set(out.values()) == {"train", "val", "test"}
    # proportions near 8/1/1 over 500 ids
    n_train = sum(1 for v in out.values() if v == "train")
    assert 320 <= n_train <= 460
    # pure function of (id, seed): python-side md5 replays it exactly
    for doc_id, split in out.items():
        b = int(hashlib.md5(f"{doc_id}|42".encode()).hexdigest()[:15], 16) % 10
        want = "train" if b < 8 else ("val" if b < 9 else "test")
        assert split == want, doc_id
    # stable under repartitioning and corpus changes (subset keeps labels)
    sub = {
        r.doc_id: r.split
        for r in dataset_split(docs.limit(50).repartition(7)).collect()
    }
    assert all(out[k] == v for k, v in sub.items())


def test_dataset_split_custom_weights_and_validation(spark):
    from grandiso_networkx_spark.operators.curation import dataset_split

    docs = spark.createDataFrame([(f"d{i}",) for i in range(100)], "doc_id string")
    out = {
        r.doc_id: r.split
        for r in dataset_split(docs, weights={"a": 1, "b": 1}, seed=7).collect()
    }
    assert set(out.values()) == {"a", "b"}
    with pytest.raises(ValueError):
        dataset_split(docs, weights={})
    with pytest.raises(ValueError):
        dataset_split(docs, weights={"a": 0, "b": 1})


class TestStratifiedSample:
    def test_deterministic_and_capped(self, spark):
        import hashlib

        from grandiso_networkx_spark.operators.curation import (
            stratified_sample,
        )

        rows = [(i, "g%d" % (i % 3)) for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, grp string")
        out1 = sorted(
            (r.doc_id, r.grp)
            for r in stratified_sample(df, "grp", 5).collect()
        )
        out2 = sorted(
            (r.doc_id, r.grp)
            for r in stratified_sample(df, "grp", 5).collect()
        )
        assert out1 == out2
        per = {}
        for d, g in out1:
            per.setdefault(g, []).append(d)
        assert all(len(v) == 5 for v in per.values())
        # python replay of the md5 order picks the same ids
        for g, ids in per.items():
            cands = [d for d, gg in rows if gg == g]
            key = lambda d: (
                int(hashlib.md5(f"{d}|42".encode()).hexdigest()[:15], 16),
                d,
            )
            want = sorted(sorted(cands, key=key)[:5])
            assert sorted(ids) == want, g

    def test_small_groups_kept_whole(self, spark):
        from grandiso_networkx_spark.operators.curation import (
            stratified_sample,
        )

        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], "doc_id long, grp string"
        )
        out = stratified_sample(df, "grp", 10).collect()
        assert len(out) == 3
