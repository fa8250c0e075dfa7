"""Sources, sinks and generators: transcript tables, edge-list / adjacency-list
text formats, deterministic graph generators, and table writers."""

from cassovary_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    synth_transcripts,
    turn_edges,
    tool_cooccurrence_edges,
    turn_vertex_ids,
)
from cassovary_spark.sources.generators import (
    complete_graph,
    random_graph,
    random_undirected_graph,
)
from cassovary_spark.sources.readers import (
    read_edge_list,
    read_adjacency_list,
    edges_from_pairs,
)
from cassovary_spark.sources.writers import (
    write_edge_list,
    write_adjacency_list,
    write_partitioned_edges,
)

__all__ = [
    "TRANSCRIPT_SCHEMA",
    "synth_transcripts",
    "turn_edges",
    "tool_cooccurrence_edges",
    "turn_vertex_ids",
    "complete_graph",
    "random_graph",
    "random_undirected_graph",
    "read_edge_list",
    "read_adjacency_list",
    "edges_from_pairs",
    "write_edge_list",
    "write_adjacency_list",
    "write_partitioned_edges",
]
