"""Driver-contract regression: every ``__spark_entry__.queries()`` callable
must run under a VANILLA SparkSession — no Arrow, default confs — because
that is what the correctness driver builds. Round 2 shipped two red queries
(`ev_bfs_events`, `ev_walk_prev_nbrs`) whose pandas nullable-Int64
conversion only survived with Arrow enabled; every pytest ran under the
tuned session (session.py enables Arrow) so nothing caught it.

Runs in a subprocess (one JVM session per pytest process) at sf0.001.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

SCRIPT = r"""
import json, sys
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("bare_session_contract")
    # ONLY the knobs the correctness driver itself sets; crucially NO Arrow.
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "false"

import __spark_entry__ as E

failures = {}
for name, fn in E.queries().items():
    try:
        df = fn(spark, sys.argv[1])
        n = df.count()
        assert n >= 0
        _ = df.schema.simpleString()
    except Exception as e:  # noqa: BLE001 — report every failing query
        failures[name] = f"{type(e).__name__}: {e}"[:300]
print("RESULT " + json.dumps(failures))
spark.stop()
"""


def test_all_driver_queries_run_on_bare_session(tmp_path):
    sf = os.environ.get("CASSOVARY_BARE_SF", "/root/testdata/sf0.001")
    if not os.path.isdir(sf):
        pytest.skip(f"testdata missing: {sf}")
    script = tmp_path / "bare_session_run.py"
    script.write_text(SCRIPT)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(script), sf],
        capture_output=True, text=True, timeout=1800, env=env,
        cwd="/root/repo",
    )
    line = next(
        (l for l in proc.stdout.splitlines() if l.startswith("RESULT ")), None
    )
    assert line is not None, (
        f"bare-session run crashed\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-2000:]}"
    )
    import json

    failures = json.loads(line[len("RESULT "):])
    assert failures == {}, f"queries red on a bare session: {failures}"
