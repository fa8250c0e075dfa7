"""Round-6 dedup_docs breakdown: where does minhash_lsh_candidates spend?

Stages isolated with a noop sink (guide §1.4):
  grams   — normalized text -> distinct shingle array
  xs      — + one md5 per shingle -> 32-bit ints
  sig     — + the 16 (A*x+B) mod p array_min passes (full signatures)
  buckets — + banding/explode -> (doc_id, band, bucket)
  cand    — the full candidate query (what the bench times)
  exact   — exact_dedup alone

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_CPUS=32 \
    python scripts/profile_dedup_r06.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from cassovary_spark.functions import exact_dedup, minhash_lsh_candidates
    from cassovary_spark.functions.dedup import (
        MINHASH_P,
        minhash_constants,
        minhash_lsh_buckets,
        minhash_signatures,
        _norm,
    )
    from cassovary_spark.session import get_spark

    spark = get_spark(app_name="profile_dedup_r06", cores=cpus,
                      shuffle_partitions=cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    n = docs.count()
    print(f"docs={n}", flush=True)

    base = docs.select(F.col("doc_id"), _norm("text").alias("t")).filter(
        F.length("t") > 0
    )
    grams_expr = F.filter(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length("t") - 2, F.lit(1))),
                lambda i: F.col("t").substr(i, F.lit(3)),
            )
        ),
        lambda g: g != "",
    )
    with_grams = base.select("doc_id", grams_expr.alias("grams"))
    xs = with_grams.select(
        "doc_id",
        F.transform(
            F.transform(F.col("grams"), F.md5),
            lambda h: F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
        ).alias("xs"),
    )

    variants = {
        "grams": lambda: noop(with_grams),
        "xs": lambda: noop(xs),
        "sig": lambda: noop(minhash_signatures(docs, 16, 3)),
        "buckets": lambda: noop(
            minhash_lsh_buckets(minhash_signatures(docs, 16, 3), 4)
        ),
        "cand": lambda: minhash_lsh_candidates(
            docs, num_hashes=16, bands=4, max_bucket_size=100
        ).count(),
        "exact": lambda: exact_dedup(docs).count(),
    }
    from cassovary_spark.functions import cache_scope, release_caches

    for name, thunk in variants.items():
        spark.sparkContext.setJobDescription(f"dedup profile: {name}")
        samples = []
        for _ in range(reps):
            with cache_scope():
                t0 = time.time()
                thunk()
                samples.append(round(time.time() - t0, 3))
            release_caches()
        print(json.dumps({"variant": name, "samples": samples}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
