"""Streaming incremental dedup == batch incremental dedup, across
micro-batch boundaries.

The stream surfaces (streaming/dedup.py) must produce exactly the verdicts
the daily batch operator produces on the same documents — the foreachBatch
variant by construction (it runs the same operator), the pure
stream-static exact join by value.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassovary_spark.functions import build_dedup_index, incremental_dedup
from cassovary_spark.streaming import (
    stream_exact_dedup,
    stream_incremental_dedup_writer,
)

DOCS_SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def corpus_index(spark):
    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog in the meadow"),
            (1, "sphinx of black quartz judge my vow said the editor twice"),
            (2, "pack my box with five dozen liquor jugs before the dawn"),
        ],
        DOCS_SCHEMA,
    )
    return build_dedup_index(corpus)


@pytest.fixture(scope="module")
def batch_chunks(spark, tmp_path_factory):
    """Arriving docs split into 3 parquet chunk dirs (3 micro-batches)."""
    rows = [
        (10, "the  quick brown fox jumps over the lazy  dog in the meadow"),
        (11, "sphinx of black quartz judge my vow said the author twice"),
        (12, "0123 4567 89zz qq88 vv77 uu66 tt55 ss44 rr33"),
        (13, "pack my box with five dozen liquor jugs before the dawn"),
        (14, "completely novel set of words nobody in the corpus wrote"),
        (15, "sphinx of black quartz judge my vow said the editor twice"),
    ]
    src = tmp_path_factory.mktemp("stream_dedup_src")
    for i in range(3):
        spark.createDataFrame(rows[i * 2 : i * 2 + 2], DOCS_SCHEMA).coalesce(
            1
        ).write.parquet(str(src / f"b{i}"))
    return spark.createDataFrame(rows, DOCS_SCHEMA), str(src)


def test_stream_full_verdicts_match_batch(spark, corpus_index, batch_chunks, tmp_path):
    all_docs, src = batch_chunks
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    out_dir = str(tmp_path / "verdicts")
    q = (
        stream_incremental_dedup_writer(stream, corpus_index, output_path=out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    want = sorted(map(tuple, incremental_dedup(all_docs, corpus_index).collect()))
    assert got == want
    # sanity on content: exact dup of corpus doc 1 flagged, novel doc kept
    by_id = {r[0]: r for r in got}
    assert by_id[15][1] == 1 and not by_id[15][3]
    assert by_id[14][2] == 0


def test_stream_exact_dedup_matches_batch(spark, corpus_index, batch_chunks, tmp_path):
    all_docs, src = batch_chunks
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    out_dir = str(tmp_path / "exact")
    q = (
        stream_exact_dedup(stream, corpus_index)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        r["doc_id"]: (r["exact_dup_of"], r["keep_exact"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        r["doc_id"]: (r["exact_dup_of"], r["exact_dup_of"] is None)
        for r in incremental_dedup(all_docs, corpus_index).collect()
    }
    assert got == want
