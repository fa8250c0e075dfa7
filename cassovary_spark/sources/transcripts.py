"""Conversation-transcript input table and graph derivations.

This is the engine's primary payload (BASELINE.json input_hint): an
Iceberg/parquet table

    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

from which link graphs are derived:
- **turn->turn adjacency**: consecutive turns within a conversation, via a
  ``lead`` window over (partition by conv_id order by turn_idx) — one shuffle
  by conv_id, no self-join.
- **tool co-occurrence**: an edge between every pair of distinct tools used in
  the same conversation (Zipf-skewed tool vocabulary => hub vertices, the
  skew case the engine must handle).

Vertex ids are dense longs through deterministic dictionaries (NodeNumberer
analog, util/SequentialNodeNumberer.scala:22). For turn vertices the id is a
*computable* encoding (conversation ordinal * 2^16 + turn_idx) rather than a
join-materialized dictionary — at 10^12 turns an id that can be computed from
the row beats an id that needs a 10^12-row dictionary join.

Everything is deterministic given (n_convs, seed): synthesis uses
xxhash64-style column hashing, not RNG state, so any executor produces the
same rows for the same parameters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# Zipf-skewed tool vocabulary: rank r gets weight ~ 1/r. Skew is intentional —
# `bash` becomes a hub vertex in the co-occurrence graph (FIXTURES.md §1).
TOOLS = ["bash", "read", "grep", "edit", "write", "glob", "web", "task"]


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    max_turns: int = 32,
    rng: str = "xxhash64",
) -> DataFrame:
    """Deterministic synthetic transcript table.

    Conversation length = 2 + hash(conv, seed) % (max_turns - 1); roles cycle
    user/assistant with tool rows where the turn uses a tool; `text` is a
    unique deterministic function of (conv_id, turn_idx) — the carrier of the
    per-turn text-equality invariant. Generated distributively from
    ``spark.range`` (no driver-side data).

    ``rng``: "xxhash64" (default, fastest) or "md5" — the md5 variant draws
    every hash as the first 13 hex chars of md5("key|...|salt") (52 bits,
    the `_walk_uniform` contract), so the SAME table is replayable
    bit-for-bit by a DuckDB SQL oracle, which lacks xxhash64."""
    if rng not in ("xxhash64", "md5"):
        raise ValueError(f"rng must be 'xxhash64' or 'md5', got {rng!r}")

    def _h(cols, salt):
        if rng == "md5":
            s = F.concat_ws(
                "|", *[c.cast("string") for c in cols], F.lit(str(salt))
            )
            return F.conv(F.substring(F.md5(s), 1, 13), 16, 10).cast("long")
        return F.xxhash64(*cols, F.lit(salt))

    convs = spark.range(n_convs).select(
        F.format_string("conv%06d", F.col("id").cast("int")).alias("conv_id"),
        F.col("id").alias("conv_ord"),
    )
    convs = convs.withColumn(
        "n_turns",
        (
            F.lit(2)
            + F.pmod(_h([F.col("conv_id")], seed), F.lit(max_turns - 1))
        ).cast("int"),
    )
    turns = convs.select(
        "conv_id",
        "conv_ord",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    h = F.pmod(_h([F.col("conv_id"), F.col("turn_idx")], seed + 1), F.lit(100))
    # ~35% of turns invoke a tool; tool choice is skewed by triangular buckets:
    # tool rank r gets weight (|TOOLS| - r), so `bash` is ~8x `task` — the hub
    # vertex the co-occurrence graph needs for skew exercises.
    tool_rank = F.pmod(
        _h([F.col("conv_id"), F.col("turn_idx")], seed + 2),
        F.lit(len(TOOLS) * (len(TOOLS) + 1) // 2),
    )
    # map triangular-number buckets to ranks: bucket < 8 -> tool 0, < 15 -> 1, ...
    boundaries = []
    acc = 0
    for r in range(len(TOOLS)):
        acc += len(TOOLS) - r
        boundaries.append(acc)
    tool_expr = F.lit(None).cast("string")
    for r in range(len(TOOLS) - 1, -1, -1):
        tool_expr = F.when(tool_rank < boundaries[r], F.lit(TOOLS[r])).otherwise(
            tool_expr
        )

    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(F.pmod("turn_idx", F.lit(2)) == 0, "user")
        .otherwise("assistant")
        .alias("role"),
        F.format_string(
            "turn %d of %s :: %d", F.col("turn_idx"), F.col("conv_id"),
            _h([F.col("conv_id"), F.col("turn_idx")], seed + 3),
        ).alias("text"),
        F.when(h < 35, tool_expr).otherwise(F.lit(None).cast("string")).alias("tool"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(mins=(F.col("conv_ord") * 60 + F.col("turn_idx")).cast("int"))
        ).alias("ts"),
    )


def turn_vertex_id(conv_ord_col, turn_idx_col):
    """Computable dense-ish turn vertex id: conv_ordinal << 16 | turn_idx."""
    return (conv_ord_col.cast("long") * F.lit(65536) + turn_idx_col.cast("long"))


def conv_ordinal(conv_id_col) -> "F.Column":
    """Computable conversation ordinal for vertex-id derivation.

    Synthetic ``convNNNNNN`` ids parse directly (the fast path the
    synthesizer guarantees — no global sort); ANY OTHER id format falls back
    to a deterministic 45-bit xxhash64 ordinal, so real-world conv_ids
    (UUIDs etc.) never produce null vertex ids or silently empty edge sets.
    Hash-ordinal collision probability is ~n^2/2^46; where exact dense ids
    are required, densify through ``graph.densify_ids`` instead.
    ``try_cast``: regexp_extract yields '' on no-match, which ANSI cast
    rejects. Shared by batch AND streaming derivations (streaming/ingest.py)
    so the two stay exact-match."""
    parsed = F.regexp_extract(conv_id_col, r"^conv(\d+)$", 1).try_cast("long")
    return F.coalesce(parsed, F.pmod(F.xxhash64(conv_id_col), F.lit(1 << 45)))


def turn_vertex_ids(transcripts: DataFrame) -> DataFrame:
    """``(conv_id, turn_idx, vid)`` vertex dictionary for turn vertices."""
    return transcripts.select(
        "conv_id",
        "turn_idx",
        turn_vertex_id(conv_ordinal(F.col("conv_id")), F.col("turn_idx")).alias("vid"),
    )


def turn_edges(transcripts: DataFrame) -> DataFrame:
    """turn->turn adjacency: (vid(t), vid(t+1)) per conversation.

    One window shuffle by conv_id; no join. Reference-row-format analog:
    NodeIdEdgesMaxId ingest records (graph/ArrayBasedDirectedGraph.scala:27-32).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    with_vid = transcripts.select(
        "conv_id",
        "turn_idx",
        turn_vertex_id(conv_ordinal(F.col("conv_id")), F.col("turn_idx")).alias("vid"),
    )
    return (
        with_vid.withColumn("next_vid", F.lead("vid").over(w))
        .filter(F.col("next_vid").isNotNull())
        .select(F.col("vid").alias("src"), F.col("next_vid").alias("dst"))
    )


def tool_cooccurrence_edges(
    transcripts: DataFrame, mutual: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Edges between tools co-used in a conversation.

    Returns ``(edges, tool_dict)`` where edges are over dense tool ids and
    ``tool_dict`` is ``(external_id=tool_name, id)``. The per-conv distinct
    tool sets are tiny (vocabulary-bounded), so the pair self-join explodes by
    at most |tools|^2 per conversation — safe at any scale. Weighted variant:
    group the result by (src, dst) and count."""
    tools = transcripts.filter(F.col("tool").isNotNull()).select("conv_id", "tool")
    # deterministic dense tool ids via a broadcastable dictionary
    from cassovary_spark.graph import densify_ids

    tool_dict = densify_ids(tools, "tool")
    enc = tools.join(
        F.broadcast(tool_dict), tools.tool == tool_dict.external_id
    ).select("conv_id", "id")
    per_conv = enc.dropDuplicates(["conv_id", "id"])
    a = per_conv.select("conv_id", F.col("id").alias("src"))
    b = per_conv.select("conv_id", F.col("id").alias("dst"))
    pairs = (
        a.join(b, "conv_id")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .dropDuplicates(["src", "dst"])
    )
    if mutual:
        from cassovary_spark.graph import mutualize

        pairs = mutualize(pairs)
    return pairs, tool_dict


def ordered_text(transcripts: DataFrame) -> DataFrame:
    """Transcript rows under the stable (conv_id, turn_idx) total order —
    carrier of the per-turn text-equality invariant (round-trip tests)."""
    return transcripts.select("conv_id", "turn_idx", "text").orderBy(
        "conv_id", "turn_idx"
    )
