"""Structured Streaming ingestion: incremental edge derivation.

The reference has no streaming surface (SURVEY §2.10) — its closest concept
is the mutable dynamic graph (ArrayBasedDynamicDirectedGraph.addEdge,
ConcurrentHashMapDynamicGraph's concurrent inserts). The Spark-native
re-expression: transcripts arrive as a STREAM, turn->turn edges are derived
incrementally with per-conversation state (`applyInPandasWithState`), and the
edge deltas append to the same table the batch operators read — the
streaming front half of `dynamic.DynamicGraph`.
"""

from cassovary_spark.streaming.ingest import (
    stream_turn_edges,
    stream_degree_counts,
)
from cassovary_spark.streaming.dedup import (
    stream_exact_dedup,
    stream_incremental_dedup_writer,
)

__all__ = [
    "stream_turn_edges",
    "stream_degree_counts",
    "stream_exact_dedup",
    "stream_incremental_dedup_writer",
]
