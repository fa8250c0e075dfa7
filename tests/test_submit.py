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


def test_submit_kill_and_resume(tmp_path):
    """North rule: resume mid-run after a REAL driver kill. The first
    spark-submit is SIGKILLed once >= 2 superstep checkpoints are durable;
    the second, with --resume, must finish the remaining supersteps without
    rewriting the pre-kill checkpoints."""
    import json
    import signal
    import time

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    zip_base = str(tmp_path / "pkg")
    shutil.make_archive(zip_base, "zip", "/root/repo", "cassovary_spark")
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    env = os.environ.copy()
    env["SPARK_GRAFT_CPUS"] = "4"
    env["CASSOVARY_SPARK_WAREHOUSE"] = str(tmp_path / "wh")
    env["CASSOVARY_SPARK_LOCAL_DIR"] = str(tmp_path / "lcl")
    cmd = [
        spark_submit, "--master", "local[4]", "--py-files", zip_base + ".zip",
        "scripts/submit_job.py", "--algorithm", "pagerank",
        "--edges", "synth:60", "--output", str(out),
        "--max-iterations", "12", "--tolerance", "0.0",
        "--checkpoint-dir", str(ckpt),
    ]
    p = subprocess.Popen(
        cmd, cwd="/root/repo", env=env, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    rundir = ckpt / "default"

    def complete_iters():
        if not rundir.exists():
            return []
        return sorted(
            d
            for d in os.listdir(rundir)
            if d.startswith("iter=")
            and os.path.exists(rundir / d / "_SUCCESS_META.json")
        )

    deadline = time.time() + 300
    try:
        while time.time() < deadline:
            if len(complete_iters()) >= 2 or p.poll() is not None:
                break
            time.sleep(0.3)
        assert p.poll() is None, "job finished before the kill could land"
        os.killpg(os.getpgid(p.pid), signal.SIGKILL)
    finally:
        p.wait()

    survivors = complete_iters()
    assert len(survivors) >= 2
    first_meta = rundir / survivors[0] / "_SUCCESS_META.json"
    pre_mtime = os.path.getmtime(first_meta)

    proc = subprocess.run(
        cmd + ["--resume"], cwd="/root/repo", env=env,
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    rec = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert rec["iterations"] == 12
    # pre-kill checkpoints were reused, not recomputed
    assert os.path.getmtime(first_meta) == pre_mtime
    final = sorted(d for d in os.listdir(rundir) if d.startswith("iter="))
    assert final[-1] == "iter=00012"
