"""A/B the ping-pong StateScratch and AQE-in-loop on the sf0.1 turn graph."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from cassovary_spark.session import get_spark
from cassovary_spark.sources import synth_transcripts, turn_edges
from cassovary_spark.operators import pagerank

spark = get_spark("profile_superstep2")
transcripts = synth_transcripts(spark, n_convs=20_000, seed=42).persist()
transcripts.count()
edges = turn_edges(transcripts).persist()
print(f"edges={edges.count()}", flush=True)

def run(tag, aqe):
    spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
    t0 = time.time()
    res = pagerank(edges, max_iterations=None, tolerance=1e-6)
    dt = time.time() - t0
    per = [h["wall_sec"] for h in res.history]
    chk = res.ranks.selectExpr("sum(pagerank) s", "sum(pagerank*pagerank) s2").first()
    print(f"{tag}: total={dt:.2f}s iters={res.iterations} "
          f"median_iter={sorted(per)[len(per)//2]:.3f} last5={per[-5:]} "
          f"chk=({chk['s']:.10f},{chk['s2']:.12e})", flush=True)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

run("warmup8_aqe", True)
run("pingpong_aqe_on", True)
run("pingpong_aqe_off", False)
run("pingpong_aqe_on2", True)
run("pingpong_aqe_off2", False)
print("DONE", flush=True)
