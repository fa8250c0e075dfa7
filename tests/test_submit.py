"""North-rule launch mode: the job really runs via ``spark-submit
--py-files <package.zip>`` in its own JVM (the cluster deployment path),
synthesizes its input in-cluster, writes parquet output, and resumes from a
checkpoint directory."""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest


@pytest.fixture(scope="module")
def submitted(tmp_path_factory):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    tmp = tmp_path_factory.mktemp("submit")
    zip_base = str(tmp / "cassovary_spark")
    shutil.make_archive(zip_base, "zip", "/root/repo", "cassovary_spark")
    out = tmp / "out"
    ckpt = tmp / "ckpt"
    env = os.environ.copy()
    env["SPARK_GRAFT_CPUS"] = "4"
    env["CASSOVARY_SPARK_WAREHOUSE"] = str(tmp / "warehouse")
    env["CASSOVARY_SPARK_LOCAL_DIR"] = str(tmp / "spark_local")
    proc = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[4]",
            "--py-files",
            zip_base + ".zip",
            "scripts/submit_job.py",
            "--algorithm",
            "pagerank",
            "--edges",
            "synth:60",
            "--output",
            str(out),
            "--max-iterations",
            "4",
            "--checkpoint-dir",
            str(ckpt),
        ],
        cwd="/root/repo",
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return {"out": out, "ckpt": ckpt, "stdout": proc.stdout}


def test_submit_produces_ranks(spark, submitted):
    df = spark.read.parquet(str(submitted["out"]))
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"id", "pagerank"}
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < 1e-6


def test_submit_wrote_resumable_checkpoints(submitted):
    # per-superstep checkpoints with lineage metadata exist on disk
    ckpt = submitted["ckpt"]
    entries = sorted(os.listdir(ckpt))
    assert entries, "checkpoint dir empty"


def test_submit_reports_metrics(submitted):
    # the job prints a one-line JSON metrics record (driver contract style)
    import json

    lines = [
        ln for ln in submitted["stdout"].splitlines() if ln.startswith("{")
    ]
    assert lines, submitted["stdout"][-2000:]
    rec = json.loads(lines[-1])
    assert rec.get("algorithm") == "pagerank"
    assert rec.get("edges", 0) > 0
