"""Physical-plan quality gates.

Correctness tests prove the answers right; these prove the PLANS right
— the properties that decide whether the same code survives a 100×
scale-up: projections reach the parquet scan (column pruning), filters
reach the scan (predicate pushdown), small dimensions broadcast, and
the motif expansion join keys stay native long on integral-id hosts.
"""

import os

import pyspark.sql.functions as F

from grandiso_networkx_spark.graph import HostGraph
from grandiso_networkx_spark.operators.match import find_motifs_df
from grandiso_networkx_spark.plans.motif import Motif

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_column_pruning_reaches_parquet_scan(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    plan = _formatted(docs.select("doc_id"))
    scan = plan[plan.index("Scan parquet") :].split("(2)")[0]
    assert "doc_id" in scan
    assert "text" not in scan  # unprojected column must not be read


def test_filter_pushdown_reaches_parquet_scan(spark):
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    plan = _formatted(ev.where(F.col("user_id") == 7).select("event_id"))
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)" in plan


def test_small_dimension_broadcasts(spark):
    # orders⋈customer with the dim under the broadcast threshold must
    # plan a broadcast hash join, not a shuffle — the default session
    # keeps autoBroadcastJoinThreshold on; the test profile disables it,
    # so assert on the explicitly hinted path used by q_top_customers.
    c = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
    o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select("c_name")
    assert "BroadcastHashJoin" in _plan(j)


def test_motif_join_keys_stay_long_on_integral_hosts(spark):
    e = spark.range(200).select(
        (F.col("id") % 50).alias("src"), ((F.col("id") * 7 + 1) % 50).alias("dst")
    )
    host = HostGraph(e, directed=True)
    m = Motif(directed=True)
    m.add_edge("A", "B")
    m.add_edge("B", "C")
    df = find_motifs_df(m, host)
    # no string cast anywhere in the optimized expansion plan
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "cast(src" not in optimized and "cast(dst" not in optimized
    host.unpersist()


def test_lsh_near_pairs_plan_is_bucket_equijoin(spark):
    # The scale path for embedding near-dup must meet candidates ONLY
    # through the bucket equi-join — an n² nested-loop anywhere means
    # the blocking failed and the plan dies at 100× data.
    from grandiso_networkx_spark.operators.similarity import embedding_near_pairs

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    plan = _plan(embedding_near_pairs(emb, dim=16, bits=6, tables=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_motif_plan_has_no_cartesian_product(spark):
    e = spark.range(100).select(
        (F.col("id") % 30).alias("src"), ((F.col("id") * 3 + 1) % 30).alias("dst")
    )
    host = HostGraph(e, directed=True)
    m = Motif(directed=True)
    m.add_edge("A", "B")
    m.add_edge("B", "C")
    m.add_edge("C", "A")
    plan = _plan(find_motifs_df(m, host))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    host.unpersist()


def test_dataset_split_is_shuffle_free(spark):
    # The split label is a pure column expression: adding it (and
    # filtering one split) must introduce NO exchange, and the filter
    # must not block scan-level column pruning.
    from grandiso_networkx_spark.operators.curation import dataset_split

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    out = dataset_split(docs.select("doc_id")).where(F.col("split") == "val")
    plan = _plan(out)
    assert "Exchange" not in plan
    scan = _formatted(out)
    scan_sec = scan[scan.index("Scan parquet") :].split("(2)")[0]
    assert "text" not in scan_sec  # pruning survived the split column


def test_neighbor_mean_shuffles_are_bounded(spark):
    # Exactly two aggregation exchanges: (id, pos) partial->final and
    # the d-bounded reassembly — plus the one join exchange pair.  A
    # collect_list-of-vectors formulation would show as a single wide
    # agg without the (id, pos) exchange; any CartesianProduct means
    # the join degenerated.
    from grandiso_networkx_spark.operators.features import (
        neighbor_mean_features,
    )

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    e = emb.select(
        F.col("vec_id").alias("src"), (F.col("vec_id") % 10).alias("dst")
    )
    feats = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    plan = _plan(neighbor_mean_features(e, feats))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # partial aggregation (map-side combine) present for the (id,pos) agg
    assert "partial_avg" in plan or "partial_average" in plan.lower()


def test_unweighted_pagerank_scatter_has_no_weight_arrays(spark):
    # Unweighted graphs must take the no-ws fast path: blocks carry no
    # per-edge weight arrays and the scatter is a bare explode(dsts) —
    # no arrays_zip struct materialization in the hot loop.  The
    # weighted path keeps the zip.
    from grandiso_networkx_spark.operators.pagerank import (
        _blocks_from,
        _scatter,
    )

    e = spark.range(200).select(
        (F.col("id") % 40).alias("s"),
        ((F.col("id") * 7 + 1) % 40).alias("d"),
        F.lit(1.0).alias("w"),
    )
    ranks = spark.range(40).select(
        F.col("id").alias("vid"), F.lit(0.025).alias("rank")
    )
    unw = _blocks_from(e, 1024, 2, "s", "d", unweighted=True)
    assert "ws" not in unw.columns
    plan_unw = _plan(
        _scatter(unw.withColumnRenamed("s", "vid"), ranks, "jvm")
    )
    assert "zip" not in plan_unw.lower()

    wtd = _blocks_from(e, 1024, 2, "s", "d")
    plan_wtd = _plan(
        _scatter(wtd.withColumnRenamed("s", "vid"), ranks, "jvm")
    )
    assert "arrays_zip" in plan_wtd
