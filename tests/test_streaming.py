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
