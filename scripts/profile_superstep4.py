"""Round-3 superstep fixed-cost experiments at 319k edges / 32 cores.

Variants, all producing bit-identical checksums (same float-sum order):
  base       — the shipped pagerank superstep loop (r2 ping-pong state)
  norepart   — drop the explicit repartition(p, id) before the state write
               (the SMJ output already reports hash(id, p); does the
               bucketed insertInto add its own exchange or not?)
  narrow     — state row is (id, pagerank) only; is_dangling comes from an
               SMJ with the static verts table at observe time (halves the
               state write/read bytes; r1 advice, also the 8->32 scaling
               hypothesis)
  chain K    — K virtual supersteps per state write: the dangling-mass
               scalar is folded into the plan as a broadcast 1-row agg, and
               per-step T1 error/dangle still collect via one Observation
               per virtual step — so a chunk is ONE job with K supersteps
               of lineage (ReusedExchange dedupes the twice-referenced
               intermediate states)

Usage: PYTHONPATH=/root/repo python scripts/profile_superstep4.py
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
from cassovary_spark.plans import choose_partitions, superstep_conf
from cassovary_spark.session import get_spark
from cassovary_spark.sources import synth_transcripts, turn_edges

DAMPING = 0.85
ITERS = 20


def run_variant(spark, edges, p, n, verts, wedges, variant, chain=1):
    damping_amount = (1.0 - DAMPING) / n
    scratch = StateScratch(spark)
    ranks = scratch.roundtrip(
        verts.select("id", F.lit(1.0 / n).alias("pagerank"), "is_dangling")
        if variant != "narrow"
        else verts.select("id", F.lit(1.0 / n).alias("pagerank")),
        bucket_by="id",
        num_buckets=p,
    )
    dangle_src = ranks if variant != "narrow" else ranks.join(verts, "id")
    dangle_mass = (
        dangle_src.filter(F.col("is_dangling"))
        .agg(F.sum("pagerank").alias("s"))
        .first()["s"]
        or 0.0
    )
    walls = []
    it = 0
    error = 1.0
    m = wedges.count()
    with superstep_conf(spark, p, m):
        while it < ITERS:
            t0 = time.time()
            steps = min(chain, ITERS - it)
            cur = ranks
            obses = []
            for _ in range(steps):
                if chain == 1:
                    dangle_sum_col = F.lit(DAMPING * dangle_mass / n)
                else:
                    src = (
                        cur
                        if variant != "narrow"
                        else cur.hint("merge").join(verts, "id")
                    )
                    dg = src.filter(F.col("is_dangling")).agg(
                        (F.lit(DAMPING) * F.sum("pagerank") / F.lit(float(n))).alias(
                            "_ds"
                        )
                    )
                    dangle_sum_col = F.col("_ds")
                contribs = (
                    wedges.hint("merge")
                    .join(cur.select(F.col("id").alias("src"), "pagerank"), "src")
                    .groupBy("dst")
                    .agg(F.sum(F.col("w") * F.col("pagerank")).alias("gathered"))
                )
                base = cur if chain == 1 else cur.crossJoin(F.broadcast(dg))
                joined = base.hint("merge").join(
                    contribs.withColumnRenamed("dst", "id"), "id", "left"
                )
                if variant == "narrow":
                    joined = joined.hint("merge").join(verts, "id")
                new = joined.select(
                    "id",
                    (
                        F.coalesce(F.col("gathered"), F.lit(0.0))
                        + F.lit(damping_amount)
                        + dangle_sum_col
                    ).alias("pagerank"),
                    "is_dangling",
                    F.col("pagerank").alias("prev"),
                )
                if variant == "base":
                    new = new.repartition(p, "id")
                obs = Observation()
                new = new.observe(
                    obs,
                    F.sum(F.abs(F.col("prev") - F.col("pagerank"))).alias("e"),
                    F.sum(F.when(F.col("is_dangling"), F.col("pagerank"))).alias("d"),
                ).drop("prev")
                if variant == "narrow":
                    new = new.drop("is_dangling")
                obses.append(obs)
                cur = new
            ranks = scratch.roundtrip(cur, bucket_by="id", num_buckets=p)
            for obs in obses:
                stats = obs.get
                error = stats["e"]
                dangle_mass = stats["d"] or 0.0
                it += 1
            walls.append(time.time() - t0)
    chk = ranks.selectExpr("sum(pagerank) s", "sum(pagerank*pagerank) s2").first()
    scratch.close()
    per = sum(walls) / ITERS
    tag = f"{variant}" + (f"_chain{chain}" if chain > 1 else "")
    print(
        f"{tag}: total={sum(walls):.2f}s per_superstep={per:.3f}s "
        f"err={error:.3e} chk=({chk['s']:.10f},{chk['s2']:.12e})",
        flush=True,
    )


def main():
    spark = get_spark("profile_superstep4")
    transcripts = synth_transcripts(spark, n_convs=20_000, seed=42).persist()
    transcripts.count()
    edges = turn_edges(transcripts).persist()
    m0 = edges.count()
    print(f"edges={m0}", flush=True)
    p = choose_partitions(spark, m0, None)
    print(f"p={p}", flush=True)
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

    for tag, variant, chain in [
        ("warmup", "base", 1),
        ("base", "base", 1),
        ("norepart", "norepart", 1),
        ("narrow", "narrow", 1),
        ("chain3", "norepart", 3),
        ("chain5", "norepart", 5),
        ("narrow_chain5", "narrow", 5),
        ("base_b", "base", 1),
        ("chain5_b", "norepart", 5),
    ]:
        run_variant(spark, edges, p, n, verts, wedges, variant, chain)
    print("DONE", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
