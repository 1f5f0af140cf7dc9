"""Checkpoint/resume manifest + per-partition metrics; multimodal
plumbing; scale smoke (the reference's largest in-repo workload)."""

import json
import os

import networkx as nx
import pytest
from pyspark.sql import functions as F

from grandiso_networkx_spark.checkpoint import CheckpointManager
from grandiso_networkx_spark.operators import multimodal
from grandiso_networkx_spark.operators.match import find_motifs, find_motifs_df
from grandiso_networkx_spark.operators.pagerank import pagerank
from grandiso_networkx_spark.sources.nx_adapter import nx_to_host
from tests.oracles import pagerank_oracle


class TestCheckpoint:
    def test_manifest_and_metrics(self, spark, tmp_path):
        cp = CheckpointManager(spark, str(tmp_path / "cp"), job="t")
        df = spark.range(100).select(F.col("id").cast("string"))
        out = cp.save(0, df)
        assert out.count() == 100
        man = json.loads(open(cp.manifest_path).read())
        assert man["rounds"][0]["rows"] == 100
        assert man["rounds"][0]["complete"]
        assert "skew_ratio" in man["rounds"][0]
        assert cp.last_round == 0

    def test_pagerank_resume_matches_fresh(self, spark, tmp_path):
        g = nx.fast_gnp_random_graph(30, 0.15, directed=True, seed=3)
        rows = [(str(u), str(v)) for u, v in g.edges()]
        e = spark.createDataFrame(rows, "src string, dst string")
        fresh = {r.id: r.rank for r in pagerank(e, tol=1e-10).collect()}

        cp = CheckpointManager(spark, str(tmp_path / "pr"), job="pr")
        first = {
            r.id: r.rank
            for r in pagerank(e, tol=1e-10, checkpoint=cp, checkpoint_every=2).collect()
        }
        # simulate a dead driver: new manager on the same path resumes
        cp2 = CheckpointManager(spark, str(tmp_path / "pr"), job="pr")
        assert cp2.last_round is not None
        assert all("l1_delta" in r for r in cp2.manifest["rounds"])
        resumed = {
            r.id: r.rank
            for r in pagerank(e, tol=1e-10, checkpoint=cp2, checkpoint_every=2).collect()
        }
        want = pagerank_oracle([(u, v, 1.0) for u, v in rows], tol=1e-10)
        for k, v in want.items():
            assert abs(fresh[k] - v) < 1e-6
            assert abs(first[k] - v) < 1e-6
            assert abs(resumed[k] - v) < 1e-6

    def test_components_lpa_resume_matches_fresh(self, spark, tmp_path):
        from grandiso_networkx_spark.operators.components import connected_components
        from grandiso_networkx_spark.operators.label_propagation import (
            label_propagation,
        )

        g = nx.fast_gnp_random_graph(40, 0.05, seed=7)
        rows = [(str(u), str(v)) for u, v in g.edges()]
        e = spark.createDataFrame(rows, "src string, dst string")

        fresh_cc = {r.id: r.component for r in connected_components(e).collect()}
        cp = CheckpointManager(spark, str(tmp_path / "cc"), job="cc")
        connected_components(e, checkpoint=cp, checkpoint_every=1).collect()
        cp2 = CheckpointManager(spark, str(tmp_path / "cc"), job="cc")
        assert cp2.last_round is not None
        # convergence metrics ride in the manifest next to the
        # per-partition lineage metrics (north rule)
        assert all("labels_changed" in r for r in cp2.manifest["rounds"])
        resumed_cc = {
            r.id: r.component
            for r in connected_components(
                e, checkpoint=cp2, checkpoint_every=1
            ).collect()
        }
        assert resumed_cc == fresh_cc

        fresh_lpa = {r.id: r.label for r in label_propagation(e).collect()}
        lp = CheckpointManager(spark, str(tmp_path / "lpa"), job="lpa")
        label_propagation(e, checkpoint=lp, checkpoint_every=1).collect()
        lp2 = CheckpointManager(spark, str(tmp_path / "lpa"), job="lpa")
        resumed_lpa = {
            r.id: r.label
            for r in label_propagation(e, checkpoint=lp2, checkpoint_every=1).collect()
        }
        assert resumed_lpa == fresh_lpa

    def test_motif_checkpointed_rounds(self, spark, tmp_path):
        host = nx_to_host(spark, nx.complete_graph(8))
        motif = nx.complete_graph(3)
        cp = CheckpointManager(spark, str(tmp_path / "mf"), job="motif")
        df = find_motifs_df(motif, host, checkpoint=cp)
        assert df.count() == 336
        man = json.loads(open(cp.manifest_path).read())
        assert len(man["rounds"]) == 2  # 3-node motif → 2 expansion rounds


class TestMultimodal:
    def test_feature_extraction_plumbing(self, spark):
        media = multimodal.synth_media(spark, n=30)
        feats = multimodal.extract_features(media, feat_dim=8).collect()
        assert len(feats) == 30
        assert all(len(r.feature) == 8 for r in feats)
        assert all(0.0 <= x <= 1.0 for r in feats for x in r.feature)
        # deterministic
        again = multimodal.extract_features(media, feat_dim=8).collect()
        assert sorted(map(str, feats)) == sorted(map(str, again))

    def test_stub_raises_without_fake(self, spark):
        media = multimodal.synth_media(spark, n=3)
        with pytest.raises(Exception, match="NotImplementedError|decoding"):
            multimodal.extract_features(media, fake_decode=False).collect()

    def test_resize_plumbing(self, spark):
        media = multimodal.synth_media(spark, n=30)
        got = multimodal.resize_images(media, width=8, height=4).collect()
        imgs = media.where(F.col("kind") == "image").count()
        assert len(got) == imgs
        assert all(len(r.payload) == 8 * 4 for r in got)
        assert all(r.width == 8 and r.height == 4 for r in got)
        again = multimodal.resize_images(media, width=8, height=4).collect()
        assert sorted(map(str, got)) == sorted(map(str, again))  # deterministic

    def test_frame_sample_plan(self, spark):
        media = multimodal.synth_media(spark, n=30)
        plan = multimodal.frame_sample_plan(media, every_n=5)
        rows = plan.collect()
        assert all(r.frame_idx % 5 == 0 for r in rows)
        vids = media.where(F.col("kind") == "video").count()
        assert plan.select("media_id").distinct().count() == vids


class TestScaleSmoke:
    # test_grandiso.py:364-371 — star(30000) + chord, K3 count == 6
    def test_star_with_chord(self, spark):
        host = nx.star_graph(30000)
        host.add_edge(6, 9)
        motif = nx.complete_graph(3)
        assert find_motifs(motif, nx_to_host(spark, host), count_only=True) == 6
