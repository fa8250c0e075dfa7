"""Scale probe for the LSH-bucketed cosine_top_k default at 10^6 vectors.

Synthesizes a clustered 1M x dim embedding table distributively (no driver
data): 100k clusters of ~10 near-duplicate vectors (hash-seeded centers +
small per-member noise) — the near-dup retrieval workload hyperplane LSH is
built for. Runs cosine_top_k(queries=None, dim=...) — i.e. the bucketed
default — and reports wall time, output rows, and recall proxy (fraction of
vectors whose top-1 is a cluster-mate). The all-pairs alternative at this
size is 10^12 scored pairs; the probe exists to show the default never goes
there.

Usage: PYTHONPATH=/root/repo python scripts/ann_scale_probe.py [n] [dim]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cassovary_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cluster_size = 10
    spark = get_spark(app_name="ann_scale_probe")

    # center[c][d] ~ U[-1,1) from xxhash64; member vector = center + 0.05*noise
    ids = spark.range(n).select(
        F.col("id").alias("vec_id"), (F.col("id") % (n // cluster_size)).alias("c")
    )
    d_seq = F.sequence(F.lit(0), F.lit(dim - 1))

    def u(col_key, d, salt):
        h = F.xxhash64(col_key, d, F.lit(salt))
        return (h.cast("double") / F.lit(float(2**63)))

    emb = ids.select(
        "vec_id",
        "c",
        F.transform(
            d_seq,
            lambda d: (u(F.col("c"), d, 1) + F.lit(0.05) * u(F.col("vec_id"), d, 2))
            .cast("float"),
        ).alias("embedding"),
    ).persist()
    emb.count()

    from cassovary_spark.functions import cosine_top_k

    t0 = time.time()
    res = cosine_top_k(
        emb,
        k=1,
        dim=dim,
        num_tables=4,
        planes_per_table=20,
        max_bucket_size=100,
    )
    top1 = res.filter(F.col("rn") == 1).alias("r")
    joined = (
        top1.join(emb.select("vec_id", "c").alias("q"), top1["q"] == F.col("q.vec_id"))
        .join(
            emb.select(F.col("vec_id").alias("v2"), F.col("c").alias("c2")),
            top1["v"] == F.col("v2"),
        )
        .select((F.col("q.c") == F.col("c2")).cast("int").alias("hit"))
    )
    agg = joined.agg(
        F.count("*").alias("rows"), F.avg("hit").alias("clustermate_rate")
    ).collect()[0]
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "n": n,
                "dim": dim,
                "wall_s": round(wall, 1),
                "top1_rows": agg["rows"],
                "clustermate_top1_rate": round(agg["clustermate_rate"], 4),
                "config": {"num_tables": 4, "planes_per_table": 20, "max_bucket_size": 100},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
