"""Node-level accessors, set-at-a-time (SURVEY §2.2).

The reference exposes per-node projections on ``Node`` (graph/Node.scala):
neighbor lists, degree, membership predicates, neighbor-set intersection,
and uniform neighbor sampling. One node at a time is the wrong granularity
for Spark — each accessor here is the DataFrame form that answers the same
question for EVERY requested node in one pass (the reference's per-node call
in a loop becomes one co-partitioned join/aggregation).

Direction: "out" follows (src -> dst); "in" follows reversed edges
(Node.scala:143-157 ``neighborIds(dir)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassovary_spark.graph import reverse_edges


def _oriented(edges: DataFrame, direction: str) -> DataFrame:
    if direction == "in":
        return reverse_edges(edges)
    if direction != "out":
        raise ValueError(f"direction must be 'in' or 'out', got {direction!r}")
    return edges.select("src", "dst")


def neighbor_lists(
    edges: DataFrame, direction: str = "out", max_neighbors: int | None = None
) -> DataFrame:
    """``(id, nbrs array<long>)`` — outboundNodes()/inboundNodes() with the
    optional prefix limit (Node.scala:35-42,89-95; limit via ``max``
    variants). Neighbors sorted ascending for determinism
    (NeighborsSortingStrategy analog)."""
    out = (
        _oriented(edges, direction)
        .groupBy(F.col("src").alias("id"))
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
    )
    if max_neighbors is not None:
        out = out.select("id", F.slice("nbrs", 1, max_neighbors).alias("nbrs"))
    return out


def neighbor_counts(edges: DataFrame, direction: str = "out") -> DataFrame:
    """``(id, count)`` — neighborCount(dir) (Node.scala:236-241)."""
    return (
        _oriented(edges, direction)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("count"))
    )


def is_neighbor(
    edges: DataFrame, pairs: DataFrame, direction: str = "out"
) -> DataFrame:
    """Membership predicate for many (id, candidate) pairs at once
    (Node.scala:79,131,213-218 isOutboundNode/isInboundNode/isNeighbor).

    ``pairs``: ``(id, candidate)``. Returns pairs + ``is_neighbor`` boolean.
    Semi-join form — the distributed binary search
    (SortedNeighborsNodeOps.scala:10-13 is the in-memory analog)."""
    e = _oriented(edges, direction).select(
        F.col("src").alias("id"), F.col("dst").alias("candidate"), F.lit(True).alias("hit")
    ).dropDuplicates(["id", "candidate"])
    return pairs.join(e, ["id", "candidate"], "left").select(
        "id", "candidate", F.coalesce("hit", F.lit(False)).alias("is_neighbor")
    )


def intersect_neighbors(
    edges: DataFrame, node_ids: list[int], direction: str = "out"
) -> DataFrame:
    """``(id, common array<long>)`` — per node, the intersection of its
    neighbor set with ``node_ids`` (Node.scala:223-229 intersect;
    SortedCSeqOps.intersectSorted is the in-memory merge variant).

    The given set is tiny (a query argument) — broadcast semi-join, then
    group; no shuffle of the full edge table beyond the grouping."""
    spark = edges.sparkSession
    wanted = spark.createDataFrame([(int(x),) for x in node_ids], "dst long")
    return (
        _oriented(edges, direction)
        .join(F.broadcast(wanted), "dst", "left_semi")
        .groupBy(F.col("src").alias("id"))
        .agg(F.sort_array(F.collect_list("dst")).alias("common"))
    )


def random_neighbors(
    edges: DataFrame,
    direction: str = "out",
    num_samples: int = 1,
    seed: int = 42,
) -> DataFrame:
    """``(id, sample array<long>)`` — uniform with-replacement neighbor
    sampling per node (Node.scala:164-205 randomNeighbor/randomNeighborSet).
    JVM-side: ``element_at(nbrs, 1 + floor(rand*size))`` repeated
    ``num_samples`` times over the grouped adjacency — no Python, no window.
    """
    adj = neighbor_lists(edges, direction)
    picks = F.array(
        *[
            F.element_at(
                "nbrs",
                (F.floor(F.rand(seed + i) * F.size("nbrs")).cast("int") + 1),
            )
            for i in range(num_samples)
        ]
    )
    return adj.select("id", picks.alias("sample"))


def exists_node(edges: DataFrame, node_ids: list[int]) -> DataFrame:
    """``(id, exists)`` for each requested id (Graph.scala:27 existsNodeId)."""
    from cassovary_spark.graph import vertices_of

    spark = edges.sparkSession
    asked = spark.createDataFrame([(int(x),) for x in node_ids], "id long")
    verts = vertices_of(edges).withColumn("hit", F.lit(True))
    return asked.join(verts, "id", "left").select(
        "id", F.coalesce("hit", F.lit(False)).alias("exists")
    )
