"""Round-6 superstep cost breakdown for the distributed PageRank path.

Phases of one superstep (pagerank.py): read bucketed state + SMJ with the
persisted wedges + groupBy(dst) + SMJ update join -> bucketed insertInto
(with observe). This script isolates where the per-superstep wall goes at a
given scale:

  A. full pagerank(engine=distributed, max_iterations=N) -> history walls
  B. the superstep SELECT alone into a noop sink (no state write)
  C. the state write alone (roundtrip of the CURRENT state, no gather)
  D. variant: Hadoop commit algorithm v2 + no _SUCCESS markers
  E. variant: num_partitions sweep

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_CPUS=32 \
      python scripts/profile_superstep_r06.py [n_convs] [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def walls(res):
    return [h["wall_sec"] for h in res.history]


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from cassovary_spark.operators import pagerank
    from cassovary_spark.session import get_spark
    from cassovary_spark.sources import synth_transcripts, turn_edges

    spark = get_spark(app_name="profile_superstep_r06", cores=cpus,
                      shuffle_partitions=cpus)
    t = synth_transcripts(spark, n_convs=n_convs, seed=42).persist()
    tedges = turn_edges(t).persist()
    m = tedges.count()
    print(f"edges={m}", flush=True)

    # warmup (codegen)
    pagerank(tedges, max_iterations=2, engine="distributed")

    out = {}
    spark.sparkContext.setJobDescription("A: full distributed pagerank")
    res = pagerank(tedges, max_iterations=iters, engine="distributed")
    out["A_full_walls"] = walls(res)

    spark.sparkContext.setJobDescription("D: commit v2, no _SUCCESS")
    keys = {
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
        "spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs": "false",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    res = pagerank(tedges, max_iterations=iters, engine="distributed")
    out["D_commitv2_walls"] = walls(res)
    for k, v in old.items():
        (spark.conf.unset(k) if v is None else spark.conf.set(k, v))

    for p in (8, 16, 32, 64):
        spark.sparkContext.setJobDescription(f"E: p={p}")
        res = pagerank(tedges, max_iterations=iters, engine="distributed",
                       num_partitions=p)
        out[f"E_p{p}_walls"] = walls(res)

    for k, v in out.items():
        med = sorted(v)[len(v) // 2]
        print(json.dumps({"variant": k, "median_superstep": med, "walls": v}),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
