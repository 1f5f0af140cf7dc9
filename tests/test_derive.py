"""Stage-0 derivation: transcripts → link graph (SURVEY.md §3.0)."""

from pyspark.sql import functions as F

from grandiso_networkx_spark.operators.derive import (
    derive_edges,
    derive_host_graph,
    derive_vertices,
    transcript_invariant_violations,
)
from grandiso_networkx_spark.sources.transcripts import synth_transcripts


def test_synth_is_deterministic(spark):
    a = synth_transcripts(spark, n_convs=20).orderBy("conv_id", "turn_idx").collect()
    b = synth_transcripts(spark, n_convs=20).orderBy("conv_id", "turn_idx").collect()
    assert a == b
    assert [f.name for f in synth_transcripts(spark, 1).schema.fields] == [
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
    ]


def test_invariant_holds(spark):
    t = synth_transcripts(spark, n_convs=30)
    assert transcript_invariant_violations(t).count() == 0


def test_reply_edges_follow_turn_order(spark):
    rows = [
        ("c1", 0, "user", "t0", None),
        ("c1", 1, "assistant", "t1", "bash"),
        ("c1", 2, "user", "t2", None),
        ("c2", 0, "user", "t0", None),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.current_timestamp())
    edges = {(r.src, r.dst, r.etype): r.weight for r in derive_edges(t).collect()}
    assert edges == {
        ("role:user", "role:assistant", "reply"): 1,
        ("role:assistant", "role:user", "reply"): 1,
        ("role:assistant", "tool:bash", "invoke"): 1,
    }
    verts = {(r.id, r.vtype) for r in derive_vertices(derive_edges(t)).collect()}
    assert verts == {
        ("role:user", "participant"),
        ("role:assistant", "participant"),
        ("tool:bash", "tool"),
    }


def test_derived_host_graph_is_simple(spark):
    t = synth_transcripts(spark, n_convs=50)
    host = derive_host_graph(t)
    edges = host.edges
    assert edges.groupBy("src", "dst").count().where(F.col("count") > 1).count() == 0
    # weights preserved in attrs
    row = edges.limit(1).collect()[0]
    assert "weight" in row.attrs and "etype" in row.attrs
    host.unpersist()


def test_transcript_scan_roundtrip(spark, tmp_path):
    from grandiso_networkx_spark.sources.tables import (
        read_transcripts,
        write_transcripts,
    )

    t = synth_transcripts(spark, n_convs=12)
    path = str(tmp_path / "tr.parquet")
    write_transcripts(t, path, partitions=2)
    back = read_transcripts(spark, path)
    assert back.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert back.count() == t.count()
    pref = read_transcripts(spark, path, conv_prefix="conv-1")
    assert pref.count() == pref.where(F.col("conv_id").startswith("conv-1")).count()
    assert 0 < pref.count() < back.count()


def test_transcript_scan_contract(spark, tmp_path):
    """The parquet path pins the scan contract the Iceberg path shares:
    conv_prefix reaches the source as a pushed filter, and a narrow
    projection prunes the read schema (an Iceberg scan adds
    partition/file pruning on top from its own metadata — VERDICT r1
    item 9's documented waiver, jar unavailable in-sandbox)."""
    from grandiso_networkx_spark.sources.tables import (
        read_transcripts,
        write_transcripts,
    )

    t = synth_transcripts(spark, n_convs=12)
    path = str(tmp_path / "tr_contract.parquet")
    write_transcripts(t, path, partitions=2)
    df = read_transcripts(spark, path, conv_prefix="conv-1").select(
        "conv_id", "turn_idx"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "StringStartsWith(conv_id,conv-1)" in plan, plan
    # column pruning: only the two projected columns reach the scan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "conv_id" in read_schema and "turn_idx" in read_schema
    assert "text" not in read_schema and "role" not in read_schema


def test_iceberg_scan_gated(spark):
    import pytest

    from grandiso_networkx_spark.sources.tables import read_transcripts

    # no iceberg-spark-runtime jar in this sandbox: the path must fail
    # loudly with the remediation in the message, not fall back.
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_transcripts(spark, "nocat.db.tbl", fmt="iceberg")
    with pytest.raises(ValueError):
        read_transcripts(spark, "x", fmt="orc2")


def test_csv_json_transcript_scan(spark, tmp_path):
    """CSV/JSON ingestion shares the parquet scan contract: explicit
    schema (no inference pass), same columns, same derived edges."""
    from grandiso_networkx_spark.operators.derive import derive_edges
    from grandiso_networkx_spark.sources.tables import read_transcripts
    from grandiso_networkx_spark.sources.transcripts import synth_transcripts

    t = synth_transcripts(spark, n_convs=12)
    csv_p, json_p = f"{tmp_path}/t_csv", f"{tmp_path}/t_json"
    t.write.option("header", "true").mode("overwrite").csv(csv_p)
    t.write.mode("overwrite").json(json_p)
    want = sorted(
        tuple(r) for r in derive_edges(t).collect()
    )
    for fmt, path in (("csv", csv_p), ("json", json_p)):
        back = read_transcripts(spark, path, fmt=fmt)
        assert back.columns == [
            "conv_id", "turn_idx", "role", "text", "tool", "ts"
        ]
        got = sorted(tuple(r) for r in derive_edges(back).collect())
        assert got == want, fmt
