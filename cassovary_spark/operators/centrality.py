"""Degree and closeness centrality.

Reference semantics:
- DegreeCentrality (algorithms/centrality/DegreeCentrality.scala:27-33):
  centrality(v) = neighborCount(v, dir) / (N - 1) when normalized, raw count
  otherwise; defined for EVERY node (0 for missing direction).
- ClosenessCentrality (algorithms/centrality/ClosenessCentrality.scala:23-39):
  per node, BFS over OutDir; with ``sum`` = total depth of reachable nodes and
  ``reach`` = number reached (including self at depth 0):
      normalized:   (reach-1) / ( (N-1)/(reach-1) * sum ) = (reach-1)^2 / ((N-1)*sum)
      unnormalized: (reach-1) / sum
  and 0.0 when sum == 0 or N <= 1.

Closeness is all-pairs BFS (O(V*E) work). The distributed form here is a
multi-source BFS: ONE frontier DataFrame keyed by (source, id) advances all
sources simultaneously, so the work per superstep is a single co-partitioned
join regardless of source count — this scales to a sampled/bounded source set
(pass ``sources``) rather than all vertices of a 100 TB graph (exact all-pairs
at that scale is out of scope for any engine; the reference itself loops
per-node in memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassovary_spark.graph import vertices_of
from cassovary_spark.operators.traversals import multi_source_bfs


def degree_centrality(
    edges: DataFrame,
    direction: str = "in",
    normalize: bool = True,
    vertices: DataFrame | None = None,
) -> DataFrame:
    """``(id, centrality)`` over all vertices, zero-filled.

    ``vertices`` (an ``(id)`` DataFrame) overrides the edge-derived vertex
    set — the engine's representation of isolated nodes (reference fixture
    g6WithEmptyNodes, graph/TestGraph.scala nodeSeqIteratorWithEmpty).
    """
    verts = vertices if vertices is not None else vertices_of(edges)
    key = "src" if direction == "out" else "dst"
    deg = edges.groupBy(F.col(key).alias("id")).agg(F.count("*").alias("deg"))
    n = verts.count()
    denom = float(n - 1) if normalize and n > 1 else 1.0
    return (
        verts.join(deg, "id", "left")
        .select(
            "id",
            (F.coalesce(F.col("deg"), F.lit(0)) / F.lit(denom)).alias("centrality"),
        )
    )


def closeness_centrality(
    edges: DataFrame,
    normalize: bool = True,
    sources: list[int] | None = None,
    num_partitions: int | None = None,
    vertices: DataFrame | None = None,
) -> DataFrame:
    """``(id, centrality)`` for each source vertex (all vertices by default).

    ``vertices`` overrides the edge-derived vertex set (isolated nodes)."""
    spark = edges.sparkSession
    verts = (vertices if vertices is not None else vertices_of(edges)).persist()
    n = verts.count()

    if sources is None:
        src_df = verts.select(F.col("id").alias("source"))
    else:
        src_df = spark.createDataFrame([(int(s),) for s in sources], "source long")

    depths = multi_source_bfs(edges, src_df, num_partitions=num_partitions)
    stats = depths.groupBy("source").agg(
        F.sum("depth").alias("depth_sum"), F.count("*").alias("reach")
    )
    reach1 = F.col("reach") - 1
    if normalize:
        value = (reach1 * reach1) / (F.lit(float(max(n - 1, 1))) * F.col("depth_sum"))
    else:
        value = reach1 / F.col("depth_sum")
    out = (
        src_df.join(stats, "source", "left")
        .select(
            F.col("source").alias("id"),
            F.when(
                (F.coalesce(F.col("depth_sum"), F.lit(0)) > 0) & (F.lit(n) > 1), value
            )
            .otherwise(F.lit(0.0))
            .alias("centrality"),
        )
    )
    verts.unpersist()
    return out
