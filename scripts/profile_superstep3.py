"""Partition-count sweep for small-graph supersteps (ping-pong state, AQE off)."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from cassovary_spark.session import get_spark
from cassovary_spark.sources import synth_transcripts, turn_edges
from cassovary_spark.operators import pagerank

spark = get_spark("profile_superstep3")
transcripts = synth_transcripts(spark, n_convs=20_000, seed=42).persist()
transcripts.count()
edges = turn_edges(transcripts).persist()
print(f"edges={edges.count()}", flush=True)

spark.conf.set("spark.sql.adaptive.enabled", "false")

def run(tag, p, sp):
    spark.conf.set("spark.sql.shuffle.partitions", str(sp))
    t0 = time.time()
    res = pagerank(edges, max_iterations=None, tolerance=1e-6, num_partitions=p)
    dt = time.time() - t0
    per = [h["wall_sec"] for h in res.history]
    chk = res.ranks.selectExpr("sum(pagerank) s", "sum(pagerank*pagerank) s2").first()
    print(f"{tag}: total={dt:.2f}s iters={res.iterations} "
          f"median={sorted(per)[len(per)//2]:.3f} chk=({chk['s']:.10f},{chk['s2']:.12e})", flush=True)

run("warm_p32", 32, 32)
run("p32_sp32", 32, 32)
run("p16_sp16", 16, 16)
run("p8_sp8", 8, 8)
run("p4_sp4", 4, 4)
run("p8_sp8_b", 8, 8)
run("p32_sp32_b", 32, 32)
print("DONE", flush=True)
