"""End-to-end spark-submit --py-files deployment smoke (north rule:
"runs via spark-submit --py-files on multi-executor clusters").

Packages the engine into dist/grandiso_networkx_spark.zip, then runs
scripts/submit_job.py through a REAL spark-submit subprocess — engine
code reaches the job only via --py-files, exactly as a cluster submit
ships it — over a deterministic synthetic transcript table, and checks
the output parquet.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pyfiles_zip():
    subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "make_pyfiles.sh")],
        check=True,
        capture_output=True,
    )
    path = os.path.join(REPO, "dist", "grandiso_networkx_spark.zip")
    assert os.path.exists(path)
    return path


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    pytest.skip("spark-submit not found")


def test_submit_pagerank_via_pyfiles(pyfiles_zip, tmp_path):
    out = str(tmp_path / "pr_out")
    env = dict(os.environ)
    # The job must import the engine from the shipped zip, not the repo
    # checkout: run from a neutral cwd and keep the repo off PYTHONPATH.
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", pyfiles_zip,
            os.path.join(REPO, "scripts", "submit_job.py"),
            "--op", "pagerank",
            "--synth-convs", "200",
            "--output", out,
            "--max-iter", "50",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert line, proc.stdout
    report = json.loads(line[-1])
    assert report["op"] == "pagerank"
    assert report["rows"] > 0

    # Scores are a probability distribution over the derived vertices.
    import duckdb

    total, nrows = duckdb.sql(
        f"SELECT sum(rank), count(*) FROM parquet_scan('{out}/*.parquet')"
    ).fetchone()
    assert nrows == report["rows"]
    assert abs(total - 1.0) < 1e-6
