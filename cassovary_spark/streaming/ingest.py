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
Like the batch ``lead()`` derivation, consecutive-by-ORDER turns are
connected even when turn_idx has gaps (a filtered or lost turn does not
break the chain).

Vertex ids use the computable encoding (conv ordinal * 2^16 + turn_idx,
sources/transcripts.turn_vertex_id). Synthetic ``convNNNNNN`` ids parse
directly; any other conv_id falls back to a deterministic 45-bit hash
ordinal (xxhash64) — collision probability ~n^2/2^46, documented, and the
job never crashes on foreign id formats.

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

from cassovary_spark.sources.transcripts import conv_ordinal, turn_vertex_id

EDGE_SCHEMA = "src long, dst long"
STATE_SCHEMA = "last_idx long, last_vid long"


def _make_turn_edge_fn(conv_timeout_ms: int | None):
    def _turn_edge_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if conv_timeout_ms is not None and state.hasTimedOut:
            # quiescent conversation: evict its (last_idx, last_vid) entry —
            # the size bound on the state store
            state.remove()
            yield pd.DataFrame({"src": pd.Series(dtype="int64"),
                                "dst": pd.Series(dtype="int64")})
            return
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
            # connect to the predecessor BY ORDER (batch lead() semantics):
            # gaps in turn_idx still chain; duplicates/reordered-below-state
            # rows (idx <= last_idx) are ignored
            if last_idx is not None and idx > last_idx:
                srcs.append(last_vid)
                dsts.append(vid)
            if last_idx is None or idx > last_idx:
                last_idx, last_vid = idx, vid

        state.update((last_idx, last_vid))
        if conv_timeout_ms is not None:
            state.setTimeoutDuration(conv_timeout_ms)
        yield pd.DataFrame(
            {"src": pd.Series(srcs, dtype="int64"), "dst": pd.Series(dsts, dtype="int64")}
        )

    return _turn_edge_fn


def stream_turn_edges(
    transcripts: DataFrame, conv_timeout_ms: int | None = None
) -> DataFrame:
    """Streaming ``(src, dst)`` turn-edge deltas from a streaming transcript
    DataFrame (the batch twin of ``sources.transcripts.turn_edges``).

    One edge per order-consecutive turn pair within a conversation,
    including pairs that SPAN micro-batches (that's the state) and pairs
    whose turn_idx has gaps (matching the batch ``lead()``).

    ``conv_timeout_ms``: when set, a conversation's state entry is evicted
    after that much processing-time inactivity — the bound on state-store
    size for continuous deployments. Left ``None`` (no timeout) the operator
    is fully deterministic under test; an edge arriving AFTER its
    conversation's eviction starts a fresh chain (the late turn loses its
    link to the pre-eviction predecessor — the standard state-TTL trade)."""
    # try_cast: regexp_extract yields '' on no-match, which ANSI cast rejects
    with_vid = transcripts.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        turn_vertex_id(conv_ordinal(F.col("conv_id")), F.col("turn_idx")).alias("vid"),
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if conv_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return with_vid.groupBy("conv_id").applyInPandasWithState(
        _make_turn_edge_fn(conv_timeout_ms),
        outputStructType=EDGE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def stream_degree_counts(edges: DataFrame) -> DataFrame:
    """Running out-degree per vertex over a streaming edge DataFrame —
    the incremental twin of ``graph.out_degrees`` (complete-mode aggregate,
    map-side partial combine like any batch hash aggregation)."""
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_degree")
    )
