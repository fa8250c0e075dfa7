"""Mutual (reciprocated) edge counting.

Reference semantics:
- getNumMutualEdgesBothDirs (graph/GraphUtils.scala:188-199): number of
  unordered pairs {a, b}, a != b, with BOTH a->b and b->a present.
- getNumMutualEdges single-direction variant (graph/DirectedGraphUtils.scala:33-58)
  packs each edge into min/max 64-bit keys, sorts, counts adjacent duplicates
  — the Spark analog is exactly least/greatest + groupBy + count == 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mutual_edge_count(edges: DataFrame) -> int:
    """Exact count of reciprocated unordered pairs."""
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    n = (
        e.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") == 2)
        .count()
    )
    return n
