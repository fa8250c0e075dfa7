"""Profile per-superstep fixed overhead at sf0.1 turn-graph scale.

Isolates the components of the ~1s/superstep constant seen in
pagerank_turns_1e6 (BENCH_r01): catalog DDL, bucketed write, table re-read,
and the join/agg job itself. Compares candidate state paths:
  A. current: DROP + saveAsTable bucketed      (per-superstep DDL)
  B. insertInto pre-created bucketed ping-pong (no per-superstep DDL)
  C. plain parquet roundtrip                   (no catalog at all)
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F
from cassovary_spark.session import get_spark
from cassovary_spark.sources import synth_transcripts, turn_edges

spark = get_spark("profile_superstep")
transcripts = synth_transcripts(spark, n_convs=20_000, seed=42).persist()
transcripts.count()
edges = turn_edges(transcripts).persist()
m = edges.count()
print(f"edges={m}", flush=True)

from cassovary_spark.operators import pagerank

# warmup + baseline per-superstep history
t0 = time.time()
res = pagerank(edges, max_iterations=8, tolerance=0.0)
print(f"A(current saveAsTable) 8 iters: {time.time()-t0:.2f}s "
      f"per-iter={[h['wall_sec'] for h in res.history]}", flush=True)

state = res.ranks.withColumn("is_dangling", F.lit(False))

# DDL-only cost: create/drop a 1-row table repeatedly
one = spark.range(1)
t0 = time.time()
for i in range(5):
    spark.sql("DROP TABLE IF EXISTS prof_ddl")
    one.write.bucketBy(32, "id").sortBy("id").mode("overwrite").format("parquet").saveAsTable("prof_ddl")
    spark.table("prof_ddl").count()
print(f"DDL 1-row saveAsTable+read: {(time.time()-t0)/5:.3f}s/iter", flush=True)

# B: ping-pong insertInto (pre-created bucketed tables)
for nm in ("prof_ping", "prof_pong"):
    spark.sql(f"DROP TABLE IF EXISTS {nm}")
    state.limit(0).write.bucketBy(32, "id").sortBy("id").mode("overwrite").format("parquet").saveAsTable(nm)
cur = state
t0 = time.time()
for i in range(6):
    nm = "prof_ping" if i % 2 == 0 else "prof_pong"
    cur.write.mode("overwrite").insertInto(nm)
    cur = spark.table(nm)
    # does the reread report bucketing? check exchange-free self-join plan
print(f"B(insertInto ping-pong) write+read: {(time.time()-t0)/6:.3f}s/iter rows={cur.count()}", flush=True)
plan = cur.hint("merge").join(cur.withColumnRenamed("pagerank", "p2"), "id")._jdf.queryExecution().executedPlan().toString()
n_exch = plan.count("Exchange")
print(f"B self-join exchanges: {n_exch} (0 expected if bucketing honored)", flush=True)

# C: plain parquet roundtrip
scratch = "/dev/shm/prof_pp"
t0 = time.time()
for i in range(6):
    p = f"{scratch}/s{i}"
    cur2 = state if i == 0 else cur2
    cur2.write.mode("overwrite").parquet(p)
    cur2 = spark.read.parquet(p)
print(f"C(plain parquet) write+read: {(time.time()-t0)/6:.3f}s/iter", flush=True)

# D: full superstep job cost alone (no state write): join+agg+join, count
t0 = time.time()
for i in range(5):
    (edges.join(cur.select(F.col("id").alias("src"), "pagerank"), "src")
          .groupBy("dst").agg(F.sum("pagerank").alias("g"))
          .join(cur, cur.id == F.col("dst"))
          .agg(F.sum("g")).collect())
print(f"D(join+agg job, no write): {(time.time()-t0)/5:.3f}s/iter", flush=True)

import shutil
shutil.rmtree(scratch, ignore_errors=True)
for nm in ("prof_ddl", "prof_ping", "prof_pong"):
    spark.sql(f"DROP TABLE IF EXISTS {nm}")
print("DONE", flush=True)
