"""A/B: shuffle/parquet compression codec impact on the bandwidth-saturated
32-core superstep (and the unsaturated 8-core level) for the 64M-edge
fixed-work PageRank. Paired interleaved runs (A,B,A,B) because wall-clock
drifts between sessions on this sandbox."""
import json, os, subprocess, sys

HERE = os.path.dirname(os.path.abspath(__file__))
CONFIGS = {
    "lz4": {},
    "zstd": {
        "spark.io.compression.codec": "zstd",
        "spark.io.compression.zstd.level": "1",
        "spark.sql.parquet.compression.codec": "zstd",
    },
}
levels = os.environ.get("AB_LEVELS", "32").split(",")
reps = int(os.environ.get("AB_REPS", "2"))
convs = os.environ.get("SCALING_CONVS", "150000")

for lvl in levels:
    for rep in range(reps):
        for name, conf in CONFIGS.items():
            env = dict(os.environ, SCALING_CHILD=lvl, SCALING_CONVS=convs,
                       SCALING_EXTRA_CONF=json.dumps(conf))
            out = subprocess.run([sys.executable, os.path.join(HERE, "scaling_run.py")],
                                 env=env, capture_output=True, text=True)
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not line:
                print(f"{name}@{lvl} rep{rep} FAILED", out.stderr[-500:], flush=True)
                continue
            r = json.loads(line[-1])
            print(json.dumps({"cfg": name, "cores": int(lvl), "rep": rep,
                              "wall": r["wall_sec"], "med": r["median_superstep_sec"],
                              "chk": r["rank_checksum"]}), flush=True)
