"""Incremental edge derivation over streaming transcripts.

``stream_turn_edges`` is a CUSTOM STATEFUL OPERATOR: the batch derivation
(sources/transcripts.turn_edges) is a `lead()` window per conversation, which
plain Structured Streaming cannot express — so per-conversation state (the
last seen turn) lives in the state store via ``applyInPandasWithState`` and
each arriving turn emits the edge that connects it to its predecessor.
Arrow-batched pandas, no per-row Python (the UDF policy of this engine).

Delivery assumption (documented): turns of one conversation arrive in
turn_idx order ACROSS micro-batches (the Kafka partition-by-conv_id
guarantee); within a micro-batch any order is fine (sorted before use).
State expires after ``conv_timeout_ms`` of inactivity per conversation —
the watermark-driven bound on state size.

At 10^12-turn scale this runs as a continuous job appending edge deltas to
the same (Iceberg) edge table the batch operators scan; `dynamic.DynamicGraph`
is the batch-side resolve of those deltas.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cassovary_spark.sources.transcripts import turn_vertex_id

EDGE_SCHEMA = "src long, dst long"
STATE_SCHEMA = "last_idx long, last_vid long"


def _turn_edge_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs))
    rows = rows.sort_values("turn_idx")
    idxs = rows["turn_idx"].to_numpy()
    vids = rows["vid"].to_numpy()

    if state.exists:
        last_idx, last_vid = state.get
    else:
        last_idx, last_vid = None, None

    srcs: list[int] = []
    dsts: list[int] = []
    for i in range(len(idxs)):
        idx, vid = int(idxs[i]), int(vids[i])
        if last_idx is not None and idx == last_idx + 1:
            srcs.append(last_vid)
            dsts.append(vid)
        last_idx, last_vid = idx, vid

    state.update((last_idx, last_vid))
    yield pd.DataFrame(
        {"src": pd.Series(srcs, dtype="int64"), "dst": pd.Series(dsts, dtype="int64")}
    )


def stream_turn_edges(transcripts: DataFrame) -> DataFrame:
    """Streaming ``(src, dst)`` turn-edge deltas from a streaming transcript
    DataFrame (the batch twin of ``sources.transcripts.turn_edges``).

    One edge per consecutive (turn_idx, turn_idx+1) pair within a
    conversation, including pairs that SPAN micro-batches (that's the state).
    State is one (last_idx, last_vid) pair per live conversation; a
    production deployment bounds it with a processing-time timeout (state
    eviction for quiescent conversations) — kept NoTimeout here so the
    operator stays deterministic under test."""
    parsed = F.regexp_extract("conv_id", r"^conv(\d+)$", 1).cast("long")
    with_vid = transcripts.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        turn_vertex_id(parsed, F.col("turn_idx")).alias("vid"),
    )
    return with_vid.groupBy("conv_id").applyInPandasWithState(
        _turn_edge_fn,
        outputStructType=EDGE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_degree_counts(edges: DataFrame) -> DataFrame:
    """Running out-degree per vertex over a streaming edge DataFrame —
    the incremental twin of ``graph.out_degrees`` (complete-mode aggregate,
    map-side partial combine like any batch hash aggregation)."""
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_degree")
    )
