"""Training-pipeline scale probe: MinHash-LSH dedup over millions of
transcript turn texts at two parallelism levels (same methodology as
scripts/scaling_run.py — fixed input, fixed partition layout, only
concurrency varies; 1 warmup pass per level).

The corpus is the synthesized transcript table's text column (deterministic,
seed 42, no external data) — short near-template documents, the skew-heavy
shape a real transcript corpus has.

Usage: python scripts/dedup_scale_probe.py
Env: DEDUP_CONVS (default 200000 -> ~3.4M docs), DEDUP_LEVELS (default 8,32)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CONVS = int(os.environ.get("DEDUP_CONVS", "200000"))
LEVELS = tuple(int(x) for x in os.environ.get("DEDUP_LEVELS", "8,32").split(","))


def child(cores: int) -> None:
    from pyspark.sql import functions as F

    from cassovary_spark.functions import minhash_lsh_candidates
    from cassovary_spark.session import get_spark
    from cassovary_spark.sources import synth_transcripts

    parts = max(LEVELS)
    spark = get_spark(
        app_name=f"dedup_probe_{cores}", cores=cores, shuffle_partitions=parts
    )
    docs = (
        synth_transcripts(spark, n_convs=N_CONVS, seed=42)
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("text"),
        )
        .persist()
    )
    n = docs.count()

    # hot-bucket cap is MANDATORY on this corpus: the texts share a template
    # scaffold, so uncapped LSH candidates explode toward ~10^12 pairs (see
    # minhash_lsh_candidates docstring) — this probe exists to prove the
    # capped path holds at millions of docs
    cap = int(os.environ.get("DEDUP_BUCKET_CAP", "100"))

    # warmup pass on a slice (JIT + code cache)
    minhash_lsh_candidates(
        docs.limit(20_000), num_hashes=16, bands=4, max_bucket_size=cap
    ).count()

    t0 = time.time()
    pairs = minhash_lsh_candidates(
        docs, num_hashes=16, bands=4, max_bucket_size=cap
    ).count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "cores": cores,
                "docs": n,
                "candidate_pairs": pairs,
                "wall_sec": round(wall, 3),
                "docs_per_sec": int(n / wall),
            }
        )
    )
    spark.stop()


def parent() -> None:
    results = {}
    for cores in LEVELS:
        env = dict(os.environ, DEDUP_CHILD=str(cores))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=False,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print("child failed:", out.stdout[-2000:], out.stderr[-2000:])
            sys.exit(1)
        results[cores] = json.loads(lines[-1])
        print(json.dumps(results[cores]))
    lo, hi = min(LEVELS), max(LEVELS)
    speedup = results[lo]["wall_sec"] / results[hi]["wall_sec"]
    eff = speedup / (hi / lo)
    same = results[lo]["candidate_pairs"] == results[hi]["candidate_pairs"]
    print(
        json.dumps(
            {
                "pair": f"{lo}->{hi}",
                "speedup": round(speedup, 2),
                "efficiency": round(eff, 2),
                "identical_pairs": same,
            }
        )
    )


if __name__ == "__main__":
    c = os.environ.get("DEDUP_CHILD")
    if c:
        child(int(c))
    else:
        parent()
