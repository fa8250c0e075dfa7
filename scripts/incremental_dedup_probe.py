"""Incremental-dedup scale probe: the daily-shard operation at corpus scale.

Index a multi-million-doc corpus ONCE (build_dedup_index -> parquet), then
probe a small daily batch against it (incremental_dedup) and measure the
probe alone — the claim under test is that probing costs batch-scale work,
not corpus-scale work: the persisted index tables are scanned in place with
the batch BROADCAST to them (no corpus reshuffle, no re-shingling).

Corpus: synthesized transcript turn texts (deterministic, seed 42 — the
template-heavy shape a real transcript corpus has; same input recipe as
scripts/dedup_scale_probe.py). The batch is 50% replayed corpus docs under
new ids (must be flagged) and 50% novel (rewritten) texts.

Usage: python scripts/incremental_dedup_probe.py
Env: INCDEDUP_CONVS (default 200000 -> ~3.4M docs),
     INCDEDUP_BATCH (default 100000 docs), INCDEDUP_CORES (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CONVS = int(os.environ.get("INCDEDUP_CONVS", "200000"))
N_BATCH = int(os.environ.get("INCDEDUP_BATCH", "100000"))
CORES = int(os.environ.get("INCDEDUP_CORES", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    from cassovary_spark.functions import DedupIndex, build_dedup_index, incremental_dedup
    from cassovary_spark.session import _scratch_root, get_spark
    from cassovary_spark.sources import synth_transcripts

    spark = get_spark(
        app_name=f"incdedup_probe_{CORES}", cores=CORES, shuffle_partitions=CORES
    )
    docs = (
        synth_transcripts(spark, n_convs=N_CONVS, seed=42)
        .select(F.monotonically_increasing_id().alias("doc_id"), F.col("text"))
        .persist()
    )
    n = docs.count()

    # one-time corpus scoring, persisted the way a daily pipeline would
    t0 = time.time()
    idx_path = os.path.join(_scratch_root(), "incdedup_probe_index")
    build_dedup_index(docs).save(idx_path)
    t_index = time.time() - t0

    idx = DedupIndex.load(spark, idx_path)
    n_fp = idx.fingerprints.count()
    n_bk = idx.buckets.count()

    # daily batch: half replayed corpus docs (new ids), half novel texts
    half = N_BATCH // 2
    replay = docs.limit(half).select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text"
    )
    novel = docs.limit(half).select(
        (F.col("doc_id") + 2_000_000_000).alias("doc_id"),
        F.concat(F.lit("novel variant :: "), F.reverse(F.col("text"))).alias("text"),
    )
    batch = replay.unionByName(novel).persist()
    m = batch.count()

    # warmup probe (codegen/JIT), then the measured probe. Hot index buckets
    # capped — same template-scaffold rationale as dedup_scale_probe.
    incremental_dedup(batch, idx, max_bucket_size=100).count()
    t0 = time.time()
    verdicts = incremental_dedup(batch, idx, max_bucket_size=100).persist()
    agg = verdicts.agg(
        F.count("*"),
        F.sum(F.col("exact_dup_of").isNotNull().cast("int")),
        F.sum((F.col("near_dup_count") > 0).cast("int")),
        F.sum(F.col("keep").cast("int")),
    ).first()
    t_probe = time.time() - t0

    exact_hits = int(agg[1])
    print(
        json.dumps(
            {
                "cores": CORES,
                "corpus_docs": n,
                "index_fingerprints": n_fp,
                "index_bucket_rows": n_bk,
                "batch_docs": m,
                "index_build_sec": round(t_index, 1),
                "probe_sec": round(t_probe, 1),
                "probe_docs_per_sec": int(m / t_probe),
                "exact_dup_hits": exact_hits,
                "near_candidate_docs": int(agg[2]),
                "kept": int(agg[3]),
                "replayed_all_flagged": exact_hits == half,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
