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
    """A base edge table + an ordered mutation log."""

    base: DataFrame
    _deltas: list[tuple[int, int, int]] = field(default_factory=list)

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

    def delta_df(self) -> DataFrame:
        spark = self.base.sparkSession
        if not self._deltas:
            return spark.createDataFrame([], "src long, dst long, op int, seq long")
        rows = [
            (s, d, op, i) for i, (s, d, op) in enumerate(self._deltas)
        ]
        return spark.createDataFrame(rows, "src long, dst long, op int, seq long")

    def current_edges(self) -> DataFrame:
        """The resolved ``(src, dst)`` view: base edges minus net-removed,
        plus net-added — last-writer-wins per key via ``max_by(op, seq)``
        (one hash aggregation over the delta log, anti/union against base).
        """
        if not self._deltas:
            return self.base.select("src", "dst")
        last = (
            self.delta_df()
            .groupBy("src", "dst")
            .agg(F.max_by("op", "seq").alias("op"))
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
