"""Structured-Streaming incremental derivation: results match the
batch derivation over the same files."""

import pytest
from pyspark.sql import functions as F

from grandiso_networkx_spark.operators.derive import derive_edges
from grandiso_networkx_spark.sources.transcripts import synth_transcripts
from grandiso_networkx_spark.streaming.derive_stream import (
    read_transcript_stream,
    stream_invoke_edge_counts,
    stream_reply_edges,
)


@pytest.fixture(scope="module")
def transcript_dir(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("stream_in"))
    t = synth_transcripts(spark, n_convs=40)
    # two file drops (two micro-batches under maxFilesPerTrigger)
    t.where(F.col("conv_id") < "conv-2").write.mode("append").parquet(p)
    t.where(~(F.col("conv_id") < "conv-2")).write.mode("append").parquet(p)
    return p


def _run_stream(spark, df, name, tmp, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", f"{tmp}/cp_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_stream_invoke_counts_match_batch(spark, transcript_dir, tmp_path):
    stream = read_transcript_stream(spark, transcript_dir, max_files=2)
    # complete mode: append would hold back windows the watermark has
    # not passed yet (the tail of the stream), by design.
    got = _run_stream(
        spark,
        stream_invoke_edge_counts(stream, window="1 hour", watermark="2 hours"),
        "invoke_counts",
        tmp_path,
        mode="complete",
    )
    got_tot = {
        (r.src, r.dst): r.total
        for r in got.groupBy("src", "dst").agg(F.sum("weight").alias("total")).collect()
    }
    batch = spark.read.parquet(transcript_dir)
    want = {
        (r.src, r.dst): r.weight
        for r in derive_edges(batch).where(F.col("etype") == "invoke").collect()
    }
    assert got_tot == want


def test_stream_reply_edges_match_batch(spark, transcript_dir, tmp_path):
    stream = read_transcript_stream(spark, transcript_dir, max_files=100)
    got = _run_stream(
        spark, stream_reply_edges(stream), "reply_edges_stream", tmp_path
    )
    got_w = {
        (r.src, r.dst): r.weight
        for r in got.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("weight")).collect()
    }
    batch = spark.read.parquet(transcript_dir)
    want = {
        (r.src, r.dst): r.weight
        for r in derive_edges(batch).where(F.col("etype") == "reply").collect()
    }
    assert got_w == want


def test_stream_sessionize_matches_batch(spark, tmp_path):
    from datetime import datetime, timedelta

    from grandiso_networkx_spark.streaming.derive_stream import (
        stream_sessionize,
    )

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # u1: two sessions (gap > 30 min between #2 and #3)
        ("u1", t0),
        ("u1", t0 + timedelta(minutes=10)),
        ("u1", t0 + timedelta(minutes=55)),
        ("u1", t0 + timedelta(minutes=60)),
        # u2: one session, one event
        ("u2", t0 + timedelta(minutes=5)),
    ]
    src_dir = str(tmp_path / "events_in")
    spark.createDataFrame(rows, "user_id string, ts timestamp").write.parquet(
        src_dir
    )
    stream = (
        spark.readStream.schema("user_id string, ts timestamp")
        .option("maxFilesPerTrigger", 100)
        .parquet(src_dir)
    )
    got = _run_stream(
        spark,
        stream_sessionize(stream, gap="30 minutes"),
        "sessions_stream",
        tmp_path,
        mode="complete",
    ).collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(
            (r.session_start, r.session_end, r.n_events)
        )
    assert len(by_user["u1"]) == 2 and len(by_user["u2"]) == 1
    s1, s2 = sorted(by_user["u1"])
    # session_window end = last event + gap
    assert s1 == (t0, t0 + timedelta(minutes=40), 2)
    assert s2 == (
        t0 + timedelta(minutes=55),
        t0 + timedelta(minutes=90),
        2,
    )
    # per-user session/event counts agree with the batch lag sessionizer
    batch = spark.read.parquet(src_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(w)
    new_s = F.when(
        prev.isNull() | ((F.col("ts") - prev) > F.expr("INTERVAL '1800' SECOND")), 1
    ).otherwise(0)
    want = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in batch.select("user_id", new_s.alias("s"))
        .groupBy("user_id")
        .agg(F.sum("s").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    got_counts = {
        u: (len(ss), sum(n for _, _, n in ss)) for u, ss in by_user.items()
    }
    assert got_counts == want


def test_stream_dedup_first_wins(spark, tmp_path):
    from datetime import datetime, timedelta

    from grandiso_networkx_spark.streaming.derive_stream import (
        stream_dedup_docs,
    )

    t0 = datetime(2026, 1, 1, 8, 0, 0)
    rows = [
        ("d1", "Hello   world", t0),
        ("d2", "hello world", t0 + timedelta(minutes=1)),  # same normalized
        ("d3", "something else", t0 + timedelta(minutes=2)),
        ("d4", "HELLO WORLD", t0 + timedelta(minutes=3)),  # dup again
    ]
    src_dir = str(tmp_path / "docs_in")
    spark.createDataFrame(
        rows, "doc_id string, text string, ts timestamp"
    ).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("doc_id string, text string, ts timestamp")
        .option("maxFilesPerTrigger", 100)
        .parquet(src_dir)
    )
    got = _run_stream(
        spark, stream_dedup_docs(stream), "dedup_stream", tmp_path
    ).collect()
    # one survivor per normalized content; earliest-ts doc wins within
    # a micro-batch
    fps = {r.fingerprint for r in got}
    assert len(got) == 2 and len(fps) == 2
    kept_ids = {r.doc_id for r in got}
    assert "d3" in kept_ids and len(kept_ids & {"d1", "d2", "d4"}) == 1

def test_stream_distinct_convs_match_batch(spark, transcript_dir, tmp_path):
    from grandiso_networkx_spark.streaming.derive_stream import (
        stream_distinct_convs,
    )

    stream = read_transcript_stream(spark, transcript_dir, max_files=2)
    got = _run_stream(
        spark,
        stream_distinct_convs(stream, window="1 hour", watermark="2 hours"),
        "distinct_convs",
        tmp_path,
        mode="complete",
    )
    batch = spark.read.parquet(transcript_dir)
    want = {
        (r.window_start, r.role): r.n_convs
        for r in batch.groupBy(
            F.window("ts", "1 hour").alias("win"), F.col("role")
        )
        .agg(F.approx_count_distinct("conv_id", 0.05).alias("n_convs"))
        .select(F.col("win.start").alias("window_start"), "role", "n_convs")
        .collect()
    }
    got_m = {(r.window_start, r.role): r.n_convs for r in got.collect()}
    assert got_m == want
    # sketch estimates stay within the configured rsd of exact
    exact = {
        (r.window_start, r.role): r.n
        for r in batch.groupBy(
            F.window("ts", "1 hour").alias("win"), F.col("role")
        )
        .agg(F.count_distinct("conv_id").alias("n"))
        .select(F.col("win.start").alias("window_start"), "role", "n")
        .collect()
    }
    for k, est in got_m.items():
        assert abs(est - exact[k]) <= max(3, 0.2 * exact[k]), k


def test_stream_static_enrichment(spark, transcript_dir, tmp_path):
    from grandiso_networkx_spark.streaming.derive_stream import (
        stream_enrich_turns,
    )

    batch = spark.read.parquet(transcript_dir)
    dim = (
        batch.select("conv_id")
        .distinct()
        .withColumn(
            "tenant",
            F.when(F.col("conv_id") < "conv-2", "acme").otherwise("globex"),
        )
    )
    stream = read_transcript_stream(spark, transcript_dir, max_files=2)
    got = _run_stream(
        spark, stream_enrich_turns(stream, dim), "enriched_turns", tmp_path
    )
    want = batch.join(dim, "conv_id").count()
    assert got.count() == want
    bad = got.where(
        (F.col("conv_id") < "conv-2") != (F.col("tenant") == "acme")
    ).count()
    assert bad == 0


def test_stream_cms_matches_batch_grid(spark, transcript_dir, tmp_path):
    from grandiso_networkx_spark.operators.cms import cms_build
    from grandiso_networkx_spark.streaming.derive_stream import (
        stream_cms_cells,
    )

    stream = read_transcript_stream(spark, transcript_dir, max_files=2)
    got = _run_stream(
        spark,
        stream_cms_cells(
            stream, window="1 hour", watermark="2 hours", depth=3, width=64
        ),
        "cms_cells",
        tmp_path,
        mode="complete",
    )
    # Merge = cell-wise addition across windows.
    merged = {
        (r.r, r.c): r.n
        for r in got.groupBy("r", "c")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    batch = spark.read.parquet(transcript_dir)
    keys = batch.where(F.col("tool").isNotNull()).select(
        F.concat(F.lit("tool:"), F.col("tool")).alias("key")
    )
    want = {
        (r.r, r.c): r.n
        for r in cms_build(keys, depth=3, width=64).collect()
    }
    assert merged == want


def test_stream_pack_sequences_matches_batch(spark, tmp_path):
    """Single-batch stream over doc files == batch pack_sequences;
    a second file drop extends shard streams without rewriting
    already-emitted windows."""
    from grandiso_networkx_spark.operators.packing import pack_sequences
    from grandiso_networkx_spark.streaming.derive_stream import (
        stream_pack_sequences,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(3 + (i * 7) % 11)))
         for i in range(30)],
        "doc_id long, text string",
    )
    p = f"{tmp_path}/docs_in"
    docs.write.mode("append").parquet(p)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 100)
        .parquet(p)
    )
    got = _run_stream(
        spark,
        stream_pack_sequences(stream, budget=8, n_shards=4),
        "pack_stream",
        tmp_path,
    )
    want = pack_sequences(docs, 8, n_shards=4)
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w

    # drop more files: previously emitted rows stay, new docs extend
    more = spark.createDataFrame(
        [(100 + i, " ".join(f"x{i}_{j}" for j in range(5))) for i in range(6)],
        "doc_id long, text string",
    )
    more.write.mode("append").parquet(p)
    got2 = _run_stream(spark, stream_pack_sequences(
        spark.readStream.schema("doc_id long, text string").parquet(p),
        budget=8, n_shards=4,
    ), "pack_stream2", tmp_path)
    g2 = sorted(tuple(r) for r in got2.collect())
    # one fresh checkpoint over both files in doc_id order == batch over all
    want_all = pack_sequences(docs.unionByName(more), 8, n_shards=4)
    assert g2 == sorted(tuple(r) for r in want_all.collect())
