"""spark-submit entry point (north rule: jobs launch via
``spark-submit --py-files`` on multi-executor clusters).

Package + submit:

    cd /root/repo && zip -qr /tmp/cassovary_spark.zip cassovary_spark
    spark-submit --master <cluster> --py-files /tmp/cassovary_spark.zip \\
        scripts/submit_job.py --algorithm pagerank \\
        --edges <path-or-synth:N_CONVS> --output /path/out \\
        [--checkpoint-dir /path/ckpt --resume]

``--edges`` accepts either a parquet path of ``(src, dst)`` edges or
``synth:<n_convs>`` to synthesize the deterministic transcript turn-graph
in-cluster (seed 42, no external data). On a cluster the session factory
leaves ``master`` to the submit environment; on a laptop it falls back to
``local[*]`` — the same file serves both.

Checkpointed algorithms (pagerank) resume mid-run from ``--checkpoint-dir``
after a driver restart: supersteps already durable are not recomputed.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_edges(spark, spec: str):
    if spec.startswith("synth:"):
        from cassovary_spark.sources import synth_transcripts, turn_edges

        t = synth_transcripts(spark, n_convs=int(spec.split(":", 1)[1]), seed=42)
        return turn_edges(t)
    return spark.read.parquet(spec).select("src", "dst")


def main() -> None:
    ap = argparse.ArgumentParser(description="cassovary_spark cluster job")
    ap.add_argument("--algorithm", required=True,
                    choices=["pagerank", "cc", "lpa", "triangles", "hits"])
    ap.add_argument("--edges", required=True,
                    help="parquet path of (src,dst) or synth:<n_convs>")
    ap.add_argument("--output", required=True, help="output parquet path")
    ap.add_argument("--max-iterations", type=int, default=None)
    ap.add_argument("--tolerance", type=float, default=1e-8)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from cassovary_spark.session import get_spark

    spark = get_spark(app_name=f"cassovary_{args.algorithm}")
    edges = load_edges(spark, args.edges).persist()
    m = edges.count()
    t0 = time.time()
    meta: dict = {"algorithm": args.algorithm, "edges": m}

    if args.algorithm == "pagerank":
        from cassovary_spark.checkpoint import CheckpointStore
        from cassovary_spark.operators import pagerank

        cp = CheckpointStore(args.checkpoint_dir) if args.checkpoint_dir else None
        res = pagerank(
            edges, max_iterations=args.max_iterations,
            tolerance=args.tolerance, checkpoint=cp, resume=args.resume,
        )
        res.ranks.write.mode("overwrite").parquet(args.output)
        meta.update(iterations=res.iterations, error=res.error)
    elif args.algorithm == "cc":
        from cassovary_spark.operators import connected_components

        connected_components(edges).write.mode("overwrite").parquet(args.output)
    elif args.algorithm == "lpa":
        from cassovary_spark.operators import label_propagation

        label_propagation(
            edges, max_iterations=args.max_iterations or 10
        ).write.mode("overwrite").parquet(args.output)
    elif args.algorithm == "hits":
        from cassovary_spark.operators import hits

        res = hits(edges, max_iterations=args.max_iterations or 100,
                   tolerance=args.tolerance)
        res.scores.write.mode("overwrite").parquet(args.output)
        meta.update(iterations=res.iterations, error=res.error)
    elif args.algorithm == "triangles":
        from cassovary_spark.operators.triangles import transitivity_stats

        stats = transitivity_stats(edges)
        spark.createDataFrame(
            [(stats["triangles"], stats["wedges"], stats["transitivity"])],
            "triangles long, wedges long, transitivity double",
        ).write.mode("overwrite").parquet(args.output)
        meta.update(stats)

    meta["wall_sec"] = round(time.time() - t0, 3)
    meta["throughput_edges_per_sec"] = (
        int(m * meta.get("iterations", 1) / meta["wall_sec"])
        if meta["wall_sec"] else None
    )
    print(json.dumps(meta))
    spark.stop()


if __name__ == "__main__":
    main()
