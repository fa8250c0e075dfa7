"""Dynamic graph: edge mutations over an immutable base (SURVEY §2.10).

Reference: graph/ArrayBasedDynamicDirectedGraph.scala:143-196 (addEdge /
removeEdge with allow-duplicates or de-dup semantics) and
ConcurrentHashMapDynamicGraph.scala:27 (concurrent inserts).

Spark-first: mutable in-place arrays don't exist at scale — the idiomatic
storage is a BASE edge table plus an append-only DELTA log of
``(src, dst, op, seq)`` rows (op = +1 add, -1 remove). ``current_edges``
resolves the log with last-writer-wins per (src, dst) — one window-free
aggregation — and ``compact`` folds the log back into a new base snapshot
(the Iceberg MERGE INTO / snapshot pattern; in this sandbox deltas and
snapshots are parquet round-trips with identical semantics). Every
mutation is O(delta) appended, never O(graph) rewritten, so a 10^12-edge
base absorbs edits at the cost of the edits alone.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class DynamicGraph:
    """A base edge table + an ordered mutation log.

    The log is a sequence of EPOCHS: API-level edits (add_edge/remove_edge)
    accumulate as literals and become one epoch-chunk when a DataFrame delta
    arrives via ``apply_delta_df`` (or when the log is read); DataFrame
    deltas — e.g. a ``stream_turn_edges`` micro-batch — are appended as
    whole epoch-chunks WITHOUT driver materialization, so a delta stream of
    any size flows through as DataFrames end-to-end. Last-writer-wins order
    is (epoch, seq): later epochs beat earlier ones; within an epoch the
    caller's ``seq`` column (enumeration order for API edits) decides.
    """

    base: DataFrame
    _deltas: list[tuple[int, int, int]] = field(default_factory=list)
    _chunks: list[DataFrame] = field(default_factory=list)  # (src,dst,op,seq,epoch)
    _epoch: int = 0

    def add_edge(self, src: int, dst: int) -> "DynamicGraph":
        """addEdge (ArrayBasedDynamicDirectedGraph.scala:143-160; de-dup
        semantics — a duplicate add is a no-op in current_edges). Mutation
        order IS the last-writer-wins sequence (delta_df enumerates)."""
        self._deltas.append((int(src), int(dst), 1))
        return self

    def remove_edge(self, src: int, dst: int) -> "DynamicGraph":
        """removeEdge (:162-196). Removing an absent edge is a no-op."""
        self._deltas.append((int(src), int(dst), -1))
        return self

    def add_edges(self, pairs: list[tuple[int, int]]) -> "DynamicGraph":
        for s, d in pairs:
            self.add_edge(s, d)
        return self

    def remove_edges(self, pairs: list[tuple[int, int]]) -> "DynamicGraph":
        for s, d in pairs:
            self.remove_edge(s, d)
        return self

    def _flush_literals(self) -> None:
        if not self._deltas:
            return
        spark = self.base.sparkSession
        rows = [(s, d, op, i) for i, (s, d, op) in enumerate(self._deltas)]
        chunk = spark.createDataFrame(rows, "src long, dst long, op int, seq long")
        self._chunks.append(chunk.withColumn("epoch", F.lit(self._epoch)))
        self._epoch += 1
        self._deltas.clear()

    def apply_delta_df(self, deltas: DataFrame) -> "DynamicGraph":
        """Append a ``(src, dst, op, seq)`` DataFrame of mutations as one
        epoch (op = +1 add, -1 remove; ``seq`` orders rows WITHIN this
        delta). The frame is composed lazily — no collect, no driver-side
        materialization — so streaming micro-batches
        (``streaming.stream_turn_edges`` output mapped to op=+1) feed the
        graph at any scale. Mutations already queued through the edge API
        are sealed into their own earlier epoch first, preserving call
        order."""
        self._flush_literals()
        self._chunks.append(
            deltas.select(
                F.col("src").cast("long"),
                F.col("dst").cast("long"),
                F.col("op").cast("int"),
                F.col("seq").cast("long"),
            ).withColumn("epoch", F.lit(self._epoch))
        )
        self._epoch += 1
        return self

    def delta_df(self) -> DataFrame:
        """The full mutation log ``(src, dst, op, seq, epoch)`` in
        last-writer-wins order (epoch, seq)."""
        spark = self.base.sparkSession
        self._flush_literals()
        if not self._chunks:
            return spark.createDataFrame(
                [], "src long, dst long, op int, seq long, epoch int"
            )
        out = self._chunks[0]
        for c in self._chunks[1:]:
            out = out.union(c)
        return out

    def current_edges(self) -> DataFrame:
        """The resolved ``(src, dst)`` view: base edges minus net-removed,
        plus net-added — last-writer-wins per key via
        ``max_by(op, (epoch, seq))`` (one hash aggregation over the delta
        log, anti/union against base).
        """
        if not self._deltas and not self._chunks:
            return self.base.select("src", "dst")
        last = (
            self.delta_df()
            .groupBy("src", "dst")
            .agg(F.max_by("op", F.struct("epoch", "seq")).alias("op"))
        )
        adds = last.filter(F.col("op") == 1).select("src", "dst")
        dels = last.filter(F.col("op") == -1).select("src", "dst")
        return (
            self.base.select("src", "dst")
            .join(dels, ["src", "dst"], "left_anti")
            .union(adds.join(self.base.select("src", "dst"), ["src", "dst"], "left_anti"))
        )

    def compact(self, path: str) -> "DynamicGraph":
        """Fold the log into a new base snapshot under ``path`` (the Iceberg
        snapshot-commit analog) and reset the log.

        Each compaction writes a NEW ``snapshot=N`` subdirectory — writing
        over the directory the current base is being read from would raise
        Spark's cannot-overwrite-a-path-being-read-from error on the second
        compact, and snapshot dirs preserve time-travel (old snapshots stay
        readable until pruned)."""
        existing = []
        if os.path.isdir(path):
            for d in os.listdir(path):
                if d.startswith("snapshot="):
                    try:
                        existing.append(int(d.split("=", 1)[1]))
                    except ValueError:
                        pass
        snap = os.path.join(path, f"snapshot={max(existing, default=-1) + 1}")
        self.current_edges().write.mode("errorifexists").parquet(snap)
        spark = self.base.sparkSession
        return DynamicGraph(spark.read.parquet(snap))
