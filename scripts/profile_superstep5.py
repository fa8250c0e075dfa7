"""Round-3 follow-up: knob sweep on top of the norepart superstep shape.

Sweeps (within one session, alternating): partition count p in {4, 6, 8},
parquet compression for state tables {snappy, uncompressed}, and the
mapreduce committer algorithm {1, 2}. All variants must print identical
checksums.

Usage: PYTHONPATH=/root/repo python scripts/profile_superstep5.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import Observation
from pyspark.sql import functions as F

from cassovary_spark.checkpoint import StateScratch
from cassovary_spark.graph import out_degrees, vertices_of
from cassovary_spark.plans import superstep_conf
from cassovary_spark.session import get_spark
from cassovary_spark.sources import synth_transcripts, turn_edges

DAMPING = 0.85
ITERS = 20


def build_static(spark, edges, p):
    outdeg = out_degrees(edges)
    verts = (
        vertices_of(edges)
        .join(outdeg, "id", "left")
        .select("id", F.col("out_degree").isNull().alias("is_dangling"))
        .repartition(p, "id")
        .sortWithinPartitions("id")
        .persist()
    )
    n = verts.count()
    wedges = (
        edges.join(outdeg.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.lit(DAMPING) / F.col("out_degree")).alias("w"))
        .repartition(p, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    wedges.count()
    return verts, wedges, n


def run(spark, tag, p, verts, wedges, n, m):
    damping_amount = (1.0 - DAMPING) / n
    scratch = StateScratch(spark)
    ranks = scratch.roundtrip(
        verts.select("id", F.lit(1.0 / n).alias("pagerank"), "is_dangling"),
        bucket_by="id",
        num_buckets=p,
    )
    dangle_mass = (
        ranks.filter(F.col("is_dangling")).agg(F.sum("pagerank").alias("s")).first()["s"]
        or 0.0
    )
    walls = []
    error = 1.0
    with superstep_conf(spark, p, m):
        for _ in range(ITERS):
            t0 = time.time()
            contribs = (
                wedges.hint("merge")
                .join(ranks.select(F.col("id").alias("src"), "pagerank"), "src")
                .groupBy("dst")
                .agg(F.sum(F.col("w") * F.col("pagerank")).alias("gathered"))
            )
            new = (
                ranks.hint("merge")
                .join(contribs.withColumnRenamed("dst", "id"), "id", "left")
                .select(
                    "id",
                    (
                        F.coalesce(F.col("gathered"), F.lit(0.0))
                        + F.lit(damping_amount)
                        + F.lit(DAMPING * dangle_mass / n)
                    ).alias("pagerank"),
                    "is_dangling",
                    F.col("pagerank").alias("prev"),
                )
            )
            obs = Observation()
            new = new.observe(
                obs,
                F.sum(F.abs(F.col("prev") - F.col("pagerank"))).alias("e"),
                F.sum(F.when(F.col("is_dangling"), F.col("pagerank"))).alias("d"),
            ).drop("prev")
            ranks = scratch.roundtrip(new, bucket_by="id", num_buckets=p)
            stats = obs.get
            error = stats["e"]
            dangle_mass = stats["d"] or 0.0
            walls.append(time.time() - t0)
    chk = ranks.selectExpr("sum(pagerank) s", "sum(pagerank*pagerank) s2").first()
    scratch.close()
    print(
        f"{tag}: total={sum(walls):.2f}s per_superstep={sum(walls)/ITERS:.3f}s "
        f"err={error:.3e} chk=({chk['s']:.10f},{chk['s2']:.12e})",
        flush=True,
    )


def main():
    spark = get_spark("profile_superstep5")
    transcripts = synth_transcripts(spark, n_convs=20_000, seed=42).persist()
    transcripts.count()
    edges = turn_edges(transcripts).persist()
    m = edges.count()
    print(f"edges={m}", flush=True)

    statics = {p: build_static(spark, edges, p) for p in (4, 6, 8)}

    def conf(key, val):
        spark.conf.set(key, val)

    plan = [
        ("warmup_p8", 8, {}),
        ("p8", 8, {}),
        ("p6", 6, {}),
        ("p4", 4, {}),
        ("p8_uncomp", 8, {"spark.sql.parquet.compression.codec": "uncompressed"}),
        ("p8_commit2", 8, {"spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2"}),
        ("p8_uncomp_commit2", 8, {
            "spark.sql.parquet.compression.codec": "uncompressed",
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
        }),
        ("p4_b", 4, {}),
        ("p8_b", 8, {}),
        ("p8_uncomp_commit2_b", 8, {
            "spark.sql.parquet.compression.codec": "uncompressed",
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
        }),
    ]
    for tag, p, confs in plan:
        saved = {}
        for k, v in confs.items():
            try:
                saved[k] = spark.conf.get(k)
            except Exception:
                saved[k] = None
            conf(k, v)
        verts, wedges, n = statics[p]
        run(spark, tag, p, verts, wedges, n, m)
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                conf(k, v)
    print("DONE", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
