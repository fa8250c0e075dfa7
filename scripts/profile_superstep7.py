"""Isolate the write-stage CPU and driver-gap costs of one superstep.

Variants (20 supersteps each, p=8, same checksums where applicable):
  ship        — shipped shape (DataFrame build + observe + bucketed insertInto)
  noobs       — same without the observe node (dangle/error via literals of the
                ship run; MEASUREMENT ONLY, not a correctness candidate)
  rawpath     — state written as plain parquet paths (no catalog, no
                insertInto, no refreshTable) but still repartitioned+sorted;
                loses bucketed-scan metadata, so joins re-exchange (both
                costs move; shows how much the catalog machinery costs)
  sqlbuild    — whole superstep built as ONE spark.sql() string over temp
                views (cuts ~15 py4j round-trips of DataFrame building)

Usage: PYTHONPATH=/root/repo python scripts/profile_superstep7.py
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
P = 8


def run(spark, tag, verts, wedges, n, m, mode):
    damping_amount = (1.0 - DAMPING) / n
    scratch = StateScratch(spark)
    ranks = scratch.roundtrip(
        verts.select("id", F.lit(1.0 / n).alias("pagerank"), "is_dangling"),
        bucket_by="id",
        num_buckets=P,
    )
    dangle_mass = (
        ranks.filter(F.col("is_dangling")).agg(F.sum("pagerank").alias("s")).first()["s"]
        or 0.0
    )
    error = 1.0
    walls = []
    wedges.createOrReplaceTempView("pr_wedges")
    with superstep_conf(spark, P, m):
        for it in range(ITERS):
            t0 = time.time()
            if mode == "sqlbuild":
                ranks.createOrReplaceTempView("pr_state")
                new = spark.sql(f"""
SELECT /*+ MERGE(c) */ s.id,
       coalesce(c.gathered, 0.0d) + {damping_amount!r}d
           + {DAMPING * dangle_mass / n!r}d AS pagerank,
       s.is_dangling,
       s.pagerank AS prev
FROM pr_state s
LEFT JOIN (
    SELECT /*+ MERGE(r) */ e.dst AS id, sum(e.w * r.pagerank) AS gathered
    FROM pr_wedges e JOIN pr_state r ON e.src = r.id
    GROUP BY e.dst
) c ON s.id = c.id
""")
            else:
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
            obs = None
            if mode != "noobs":
                obs = Observation()
                new = new.observe(
                    obs,
                    F.sum(F.abs(F.col("prev") - F.col("pagerank"))).alias("e"),
                    F.sum(F.when(F.col("is_dangling"), F.col("pagerank"))).alias("d"),
                )
            new = new.drop("prev")
            if mode == "rawpath":
                path = f"/dev/shm/cassovary_scratch/prof7_{tag}_{it % 2}"
                new.repartition(P, "id").sortWithinPartitions("id").write.mode(
                    "overwrite"
                ).parquet(path)
                ranks = spark.read.parquet(path)
            else:
                ranks = scratch.roundtrip(new, bucket_by="id", num_buckets=P)
            if obs is not None:
                stats = obs.get
                error = stats["e"]
                dangle_mass = stats["d"] or 0.0
            else:
                # measurement-only: reuse a frozen dangle_mass
                pass
            walls.append(time.time() - t0)
    chk = ranks.selectExpr("sum(pagerank) s", "sum(pagerank*pagerank) s2").first()
    scratch.close()
    print(
        f"{tag}: total={sum(walls):.2f}s per_superstep={sum(walls)/ITERS:.3f}s "
        f"err={error:.3e} chk=({chk['s']:.10f},{chk['s2']:.12e})",
        flush=True,
    )


def main():
    spark = get_spark("profile_superstep7")
    transcripts = synth_transcripts(spark, n_convs=20_000, seed=42).persist()
    transcripts.count()
    edges = turn_edges(transcripts).persist()
    m = edges.count()
    print(f"edges={m}", flush=True)
    outdeg = out_degrees(edges)
    verts = (
        vertices_of(edges)
        .join(outdeg, "id", "left")
        .select("id", F.col("out_degree").isNull().alias("is_dangling"))
        .repartition(P, "id")
        .sortWithinPartitions("id")
        .persist()
    )
    n = verts.count()
    wedges = (
        edges.join(outdeg.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.lit(DAMPING) / F.col("out_degree")).alias("w"))
        .repartition(P, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    wedges.count()

    for tag, mode in [
        ("warmup", "ship"),
        ("ship", "ship"),
        ("sqlbuild", "sqlbuild"),
        ("ship_b", "ship"),
        ("sqlbuild_b", "sqlbuild"),
        ("ship_c", "ship"),
    ]:
        run(spark, tag, verts, wedges, n, m, mode)
    print("DONE", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
