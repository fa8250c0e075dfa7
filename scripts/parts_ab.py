"""A/B: 32 vs 64 partitions on the 32-core 64M-edge fixed-work PageRank
(straggler/wave-balance hypothesis). Interleaved reps."""
import json, os, subprocess, sys
HERE = os.path.dirname(os.path.abspath(__file__))
for rep in range(2):
    for parts in ("32", "64"):
        env = dict(os.environ, SCALING_CHILD="32", SCALING_CONVS="4000000",
                   SCALING_PARTS=parts)
        out = subprocess.run([sys.executable, os.path.join(HERE, "scaling_run.py")],
                             env=env, capture_output=True, text=True)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"parts={parts} rep{rep} FAILED", out.stderr[-400:], flush=True); continue
        r = json.loads(line[-1])
        print(json.dumps({"parts": parts, "rep": rep, "wall": r["wall_sec"],
                          "med": r["median_superstep_sec"], "chk": r["rank_checksum"],
                          "walls": r["superstep_walls"]}), flush=True)
