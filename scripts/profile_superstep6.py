"""Decompose the ~0.45s/superstep floor with Spark event logs.

Runs 10 norepart supersteps at p=8 with eventLog enabled, then parses the
event log: per-job wall, sum of task run times, scheduler delay, and the
DRIVER GAPS between jobs (planning + obs.get + catalog refresh + python).

Usage: PYTHONPATH=/root/repo python scripts/profile_superstep6.py
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

EVDIR = "/dev/shm/spark_events_prof"
os.makedirs(EVDIR, exist_ok=True)
os.environ["SPARK_GRAFT_EXTRA_CONF"] = json.dumps(
    {"spark.eventLog.enabled": "true", "spark.eventLog.dir": EVDIR}
)

from pyspark.sql import Observation
from pyspark.sql import functions as F

from cassovary_spark.checkpoint import StateScratch
from cassovary_spark.graph import out_degrees, vertices_of
from cassovary_spark.plans import superstep_conf
from cassovary_spark.session import get_spark
from cassovary_spark.sources import synth_transcripts, turn_edges

DAMPING = 0.85
ITERS = 10
P = 8


def main():
    spark = get_spark("profile_superstep6")
    if spark.conf.get("spark.eventLog.enabled", "false") != "true":
        # session builder may not honor extra conf env; set directly is not
        # possible post-start, so rebuild plainly
        spark.stop()
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .appName("profile_superstep6")
            .config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", EVDIR)
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.memory.offHeap.enabled", "true")
            .config("spark.memory.offHeap.size", "24g")
            .config("spark.local.dir", "/dev/shm/cassovary_scratch/spark_local")
            .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
            .config(
                "spark.sql.warehouse.dir",
                "/dev/shm/cassovary_scratch/cassovary_warehouse",
            )
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("WARN")
    transcripts = synth_transcripts(spark, n_convs=20_000, seed=42).persist()
    transcripts.count()
    edges = turn_edges(transcripts).persist()
    m = edges.count()
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
    marks = []
    with superstep_conf(spark, P, m):
        # warmup supersteps excluded from the marked window
        for it in range(ITERS + 3):
            if it == 3:
                t_start = time.time() * 1000
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
            t_preplan = time.time()
            ranks = scratch.roundtrip(new, bucket_by="id", num_buckets=P)
            t_write = time.time()
            stats = obs.get
            dangle_mass = stats["d"] or 0.0
            if it >= 3:
                marks.append(
                    {
                        "superstep_wall": round(time.time() - t0, 3),
                        "py_build": round(t_preplan - t0, 3),
                        "roundtrip": round(t_write - t_preplan, 3),
                        "obs_get": round(time.time() - t_write, 3),
                    }
                )
    app_id = spark.sparkContext.applicationId
    spark.stop()

    for mrk in marks:
        print(mrk)

    evfile = sorted(glob.glob(f"{EVDIR}/{app_id}*"))[0]
    jobs = {}
    stages = {}
    with open(evfile) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {"start": ev["Submission Time"]}
            elif e == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j is not None:
                    j["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split(" ")[0],
                    "start": si.get("Submission Time"),
                    "end": si.get("Completion Time"),
                    "tasks": si["Number of Tasks"],
                }
    window = [
        (jid, j) for jid, j in sorted(jobs.items()) if j.get("start", 0) >= t_start
    ]
    prev_end = None
    print("\njob timeline (ms):")
    for jid, j in window:
        gap = (j["start"] - prev_end) if prev_end else 0
        print(f"  job {jid}: wall={j['end']-j['start']:5d}  gap_before={gap:5d}")
        prev_end = j["end"]
    print("\nstage walls in window (ms):")
    for sid, s in sorted(stages.items()):
        if s["start"] and s["start"] >= t_start:
            print(
                f"  stage {sid} [{s['name']}] tasks={s['tasks']} "
                f"wall={s['end']-s['start']}"
            )


if __name__ == "__main__":
    main()
