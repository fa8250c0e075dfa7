"""Superstep floor, next two candidates after the sqlbuild win (profile 7):

  ship    — shipped shape: single-SQL superstep over catalog state tables,
            state rows (id, pagerank, is_dangling), snappy parquet
  nocomp  — same, state parquet written uncompressed (write stage measured
            CPU-bound at ~200ms/task for 20k rows; codec CPU is a candidate)
  narrow  — state rows narrowed to (id, pagerank); is_dangling joined from
            the static sorted vertex table inside the superstep SQL
            (zero-exchange merge join) and dropped before the write.
            UnsafeRow in the write pipeline shrinks 4 cols -> 3; parquet
            bytes barely change (boolean is bit-packed) — this isolates
            whether the write cost is row-width CPU or fixed task overhead.
            Also the r1-advised state shape for the 8->32 bandwidth test.
  narrow_nocomp — both.

Usage: PYTHONPATH=/root/repo python scripts/profile_superstep8.py
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
ITERS = int(os.environ.get("PROF8_ITERS", "20"))
P = int(os.environ.get("PROF8_P", "8"))
N_CONVS = int(os.environ.get("PROF8_CONVS", "20000"))


def run(spark, tag, verts, wedges, n, m, narrow, codec):
    damping_amount = (1.0 - DAMPING) / n
    scratch = StateScratch(spark)
    init_cols = ["id", F.lit(1.0 / n).alias("pagerank")]
    if not narrow:
        init_cols.append("is_dangling")
    ranks = scratch.roundtrip(
        verts.select(*init_cols), bucket_by="id", num_buckets=P
    )
    dangle_mass = (
        verts.filter(F.col("is_dangling")).count() / n
    )
    error = 1.0
    walls = []
    wedges.createOrReplaceTempView("pr_wedges")
    verts.createOrReplaceTempView("pr_verts")
    old_codec = spark.conf.get("spark.sql.parquet.compression.codec", "snappy")
    spark.conf.set("spark.sql.parquet.compression.codec", codec)
    try:
        with superstep_conf(spark, P, m):
            for it in range(ITERS):
                t0 = time.time()
                state = scratch.last_table or "pr_state"
                if scratch.last_table is None:
                    ranks.createOrReplaceTempView("pr_state")
                dangle_src = "v.is_dangling" if narrow else "s.is_dangling"
                verts_join = "JOIN pr_verts v ON s.id = v.id" if narrow else ""
                new = spark.sql(f"""
SELECT /*+ MERGE(c) */ s.id,
       coalesce(c.gathered, 0.0d) + {damping_amount!r}d
           + {DAMPING * dangle_mass / n!r}d AS pagerank,
       {dangle_src} AS is_dangling,
       s.pagerank AS prev
FROM {state} s {verts_join}
LEFT JOIN (
    SELECT /*+ MERGE(r) */ e.dst AS id, sum(e.w * r.pagerank) AS gathered
    FROM pr_wedges e JOIN {state} r ON e.src = r.id
    GROUP BY e.dst
) c ON s.id = c.id
""")
                obs = Observation()
                new = new.observe(
                    obs,
                    F.sum(F.abs(F.col("prev") - F.col("pagerank"))).alias("e"),
                    F.sum(F.when(F.col("is_dangling"), F.col("pagerank"))).alias("d"),
                ).drop("prev")
                if narrow:
                    new = new.drop("is_dangling")
                ranks = scratch.roundtrip(new, bucket_by="id", num_buckets=P)
                stats = obs.get
                error = stats["e"]
                dangle_mass = stats["d"] or 0.0
                walls.append(time.time() - t0)
    finally:
        spark.conf.set("spark.sql.parquet.compression.codec", old_codec)
    chk = ranks.selectExpr("sum(pagerank) s", "sum(pagerank*pagerank) s2").first()
    scratch.close()
    walls_s = sorted(walls)
    print(
        f"{tag}: total={sum(walls):.2f}s per_superstep={sum(walls)/ITERS:.3f}s "
        f"median={walls_s[ITERS // 2]:.3f}s err={error:.3e} "
        f"chk=({chk['s']:.10f},{chk['s2']:.12e})",
        flush=True,
    )


def main():
    spark = get_spark("profile_superstep8")
    transcripts = synth_transcripts(spark, n_convs=N_CONVS, seed=42).persist()
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

    variants = {
        "full": [
            ("warmup", False, "snappy"),
            ("ship", False, "snappy"),
            ("nocomp", False, "uncompressed"),
            ("narrow", True, "snappy"),
            ("narrow_nocomp", True, "uncompressed"),
            ("ship_b", False, "snappy"),
            ("nocomp_b", False, "uncompressed"),
            ("narrow_b", True, "snappy"),
            ("narrow_nocomp_b", True, "uncompressed"),
        ],
        # after the StateScratch uncompressed-state adoption the codec knob
        # here is vestigial (roundtrip always writes uncompressed); the
        # remaining A/B is state width only
        "narrow_ab": [
            ("warmup", False, "snappy"),
            ("ship", False, "snappy"),
            ("narrow", True, "snappy"),
            ("ship_b", False, "snappy"),
            ("narrow_b", True, "snappy"),
        ],
    }[os.environ.get("PROF8_VARIANTS", "full")]
    for tag, narrow, codec in variants:
        run(spark, tag, verts, wedges, n, m, narrow, codec)
    print("DONE", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()


