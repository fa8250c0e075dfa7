"""Import-hygiene regression guard for the driver entry module.

The ``\\s``-in-a-non-raw-f-string defect shipped twice (r4 flagged line
1878, r5 reintroduced it at the doc_scrub oracle) — this test imports
``__spark_entry__`` in a fresh interpreter with DeprecationWarning (and
SyntaxWarning, its 3.12+ successor) promoted to errors so it cannot ship a
third time. A subprocess is required: the module is usually already
imported (and its string literals already compiled) in the test process.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_imports_clean_of_deprecation_warnings():
    r = subprocess.run(
        [
            sys.executable,
            "-W", "error::DeprecationWarning",
            "-W", "error::SyntaxWarning",
            "-c", "import __spark_entry__",
        ],
        capture_output=True,
        text=True,
        cwd=REPO_ROOT,
        env={**os.environ, "PYTHONPATH": REPO_ROOT},
        timeout=120,
    )
    assert r.returncode == 0, f"stderr:\n{r.stderr}"
