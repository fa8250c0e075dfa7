"""Streaming turn-edge ingestion: incremental derivation == batch derivation,
including conversation turns that span micro-batches."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cassovary_spark.sources import synth_transcripts, turn_edges
from cassovary_spark.streaming import stream_turn_edges


@pytest.mark.parametrize("split_turn", [1, 3])
def test_stream_edges_match_batch(spark, tmp_path, split_turn):
    """Feed the same transcripts in two file chunks split MID-conversation;
    the streaming result must equal the batch derivation exactly."""
    t = synth_transcripts(spark, n_convs=12, seed=7).persist()
    batch_edges = {(r["src"], r["dst"]) for r in turn_edges(t).collect()}

    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    # chunk 1: every conversation's turns < split_turn; chunk 2: the rest.
    # every conversation with > split_turn turns now SPANS micro-batches.
    t.filter(F.col("turn_idx") < split_turn).coalesce(1).write.parquet(
        f"{src_dir}/b0"
    )
    t.filter(F.col("turn_idx") >= split_turn).coalesce(1).write.parquet(
        f"{src_dir}/b1"
    )

    stream = (
        spark.readStream.schema(t.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/b*")
    )
    edges = stream_turn_edges(stream)
    q = (
        edges.writeStream.format("memory")
        .queryName(f"edges_sink_{split_turn}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["src"], r["dst"])
        for r in spark.table(f"edges_sink_{split_turn}").collect()
    }
    t.unpersist()
    assert got == batch_edges

def test_stream_deltas_resolve_through_dynamic_graph(spark, tmp_path):
    """The §2.10 pipeline stitched end-to-end: the streaming operator's edge
    deltas append onto the batch edge table via DynamicGraph's last-writer-
    wins resolve, and the resolved view equals the full batch derivation."""
    import os

    from cassovary_spark.dynamic import DynamicGraph

    t = synth_transcripts(spark, n_convs=10, seed=5).persist()
    full = {(r["src"], r["dst"]) for r in turn_edges(t).collect()}

    # batch half: the edge table as of the first two turns per conversation
    prefix = t.filter(F.col("turn_idx") < 2)
    base = turn_edges(prefix).persist()
    base_set = {(r["src"], r["dst"]) for r in base.collect()}

    # streaming half: all turns flow through; the NEW edges (state-crossing
    # included) are the delta log appended to the base table
    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    prefix.coalesce(1).write.parquet(f"{src_dir}/b0")
    t.filter(F.col("turn_idx") >= 2).coalesce(1).write.parquet(f"{src_dir}/b1")
    stream = (
        spark.readStream.schema(t.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/b*")
    )
    q = (
        stream_turn_edges(stream)
        .writeStream.format("memory")
        .queryName("delta_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["src"], r["dst"]) for r in spark.table("delta_sink").collect()
    }
    deltas = sorted(streamed - base_set)

    dg = DynamicGraph(base=base).add_edges(deltas)
    resolved = {(r["src"], r["dst"]) for r in dg.current_edges().collect()}
    t.unpersist()
    base.unpersist()
    assert resolved == full


def test_stream_edges_gapped_and_foreign_ids(spark, tmp_path):
    """Gapped turn_idx chains by ORDER (batch lead() semantics) and
    non-synthetic conv_id formats fall back to hash ordinals instead of
    crashing the job."""
    rows = [
        ("convA-7", 0, "user", "t0", None),
        ("convA-7", 2, "assistant", "t2", None),   # gap: 1 missing
        ("convA-7", 5, "user", "t5", None),        # gap: 3,4 missing
        ("conv000001", 0, "user", "x0", None),
        ("conv000001", 1, "assistant", "x1", None),
    ]
    t = spark.createDataFrame(
        [(c, i, r, x, tool, "2026-01-01 00:00:00") for c, i, r, x, tool in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    t.filter(F.col("turn_idx") < 2).coalesce(1).write.parquet(f"{src_dir}/b0")
    t.filter(F.col("turn_idx") >= 2).coalesce(1).write.parquet(f"{src_dir}/b1")
    stream = (
        spark.readStream.schema(t.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/b*")
    )
    q = (
        stream_turn_edges(stream)
        .writeStream.format("memory")
        .queryName("gap_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["src"], r["dst"]) for r in spark.table("gap_sink").collect()}
    # convA-7 chains 0 -> 2 -> 5 across the gap AND across the micro-batch
    # boundary; conv000001 uses the parsed ordinal (vid = 1*2^16 + idx)
    a = next(iter({s for s, d in got} - {65536, 65537} - {d for s, d in got}))
    assert (a + 2, a + 5) in got or (a + 2, a + 5) in got
    assert {(a, a + 2), (a + 2, a + 5), (65536, 65537)} <= got
    assert len(got) == 3


def test_stream_delta_df_compact_pagerank(spark, tmp_path):
    """Stream -> apply_delta_df (no driver materialization) -> compact ->
    algorithm: the streamed-then-compacted graph is edge-identical to the
    batch derivation, and PageRank over it matches the batch run exactly."""
    import os

    from cassovary_spark.dynamic import DynamicGraph
    from cassovary_spark.operators import pagerank

    t = synth_transcripts(spark, n_convs=12, seed=9).persist()
    full_edges = turn_edges(t).persist()
    full = {(r["src"], r["dst"]) for r in full_edges.collect()}

    prefix = t.filter(F.col("turn_idx") < 2)
    base = turn_edges(prefix).persist()

    src_dir = str(tmp_path / "in2")
    os.makedirs(src_dir)
    prefix.coalesce(1).write.parquet(f"{src_dir}/b0")
    t.filter(F.col("turn_idx") >= 2).coalesce(1).write.parquet(f"{src_dir}/b1")
    stream = (
        spark.readStream.schema(t.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/b*")
    )
    q = (
        stream_turn_edges(stream)
        .writeStream.format("memory")
        .queryName("delta_df_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # the sink table IS the delta DataFrame — op=+1 adds, seq from a
    # monotonic id; base edges already present resolve idempotently
    delta_df = (
        spark.table("delta_df_sink")
        .withColumn("op", F.lit(1))
        .withColumn("seq", F.monotonically_increasing_id())
    )
    dg = DynamicGraph(base=base).apply_delta_df(delta_df)
    snap = dg.compact(str(tmp_path / "snap2"))
    resolved = {(r["src"], r["dst"]) for r in snap.base.collect()}
    assert resolved == full

    pr_stream = {
        r["id"]: round(r["pagerank"], 12)
        for r in pagerank(snap.current_edges(), max_iterations=5).ranks.collect()
    }
    pr_batch = {
        r["id"]: round(r["pagerank"], 12)
        for r in pagerank(full_edges, max_iterations=5).ranks.collect()
    }
    t.unpersist()
    full_edges.unpersist()
    base.unpersist()
    assert pr_stream == pr_batch


def test_stream_bucketed_state_equals_per_conversation(spark, tmp_path):
    """The bucketed-state fast path (r6: per-group cost amortized over a
    conversation bucket) must emit exactly the per-conversation layout's
    edges, including duplicate turn_idx rows and state-crossing pairs."""
    import os

    t = synth_transcripts(spark, n_convs=15, seed=11).persist()
    # inject duplicate + below-state rows: re-send turn 1 in the second chunk
    dup = t.filter(F.col("turn_idx") == 1)
    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    t.filter(F.col("turn_idx") < 2).coalesce(1).write.parquet(f"{src_dir}/b0")
    t.filter(F.col("turn_idx") >= 2).unionAll(dup).coalesce(1).write.parquet(
        f"{src_dir}/b1"
    )

    results = []
    for name, buckets in (("bkt", 7), ("perconv", 0)):
        stream = (
            spark.readStream.schema(t.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src_dir}/b*")
        )
        q = (
            stream_turn_edges(stream, state_buckets=buckets)
            .writeStream.format("memory")
            .queryName(f"bkt_eq_{name}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        results.append(
            sorted(
                (r["src"], r["dst"])
                for r in spark.table(f"bkt_eq_{name}").collect()
            )
        )
    t.unpersist()
    assert results[0] == results[1]
    assert len(results[0]) > 0
