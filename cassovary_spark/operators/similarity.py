"""Neighborhood similarity (Jaccard / cosine) with top-k per node.

Reference semantics (algorithms/similarity/):
- Jaccard (JaccardSimilarity.scala:27-34): |N(u) ∩ N(v)| / |N(u) ∪ N(v)|
- Cosine (CosineSimilarity.scala:27-33): |N(u) ∩ N(v)| / sqrt(|N(u)|·|N(v)|)
- candidates for u are the 2-hop neighborhood: nodes sharing >= 1
  out-neighbor (Similarity.scala:58-67 when both directions stored);
  only scores > 0 are kept (:71)
- top-k ordering: score DESC, then node id ASC (SimilarNodes.compare, :20-24)

Spark form: one self-join of the edge table on the shared neighbor
(``e1(u,w) ⋈ e2(v,w)``) + count — the candidate restriction falls out of the
join itself (pairs with zero common neighbors are never materialized,
which is what makes this feasible at scale), then a degree join and a
per-u window top-k (TakeOrdered-style; reference SmallBoundedPriorityQueue).

Direction: pass the edge table already oriented the way you want N(.) read
(OutDir = as-is, InDir = reverse_edges(edges)).

Skew note: the join fans out by the IN-degree of the shared neighbor w —
a hub w with in-degree D produces D^2 candidate pairs. ``max_fanout``
optionally drops shared neighbors above that in-degree (a documented
approximation; the reference has the same blow-up implicitly and simply
never runs at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassovary_spark.graph import out_degrees


def _common_neighbor_counts(edges: DataFrame, max_fanout: int | None) -> DataFrame:
    e = edges.select("src", "dst")
    if max_fanout is not None:
        hubs = (
            e.groupBy("dst").agg(F.count("*").alias("d")).filter(F.col("d") > max_fanout)
        )
        e = e.join(hubs.select("dst"), "dst", "left_anti")
    e1 = e.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    e2 = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    return (
        e1.join(e2, "w")
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("common"))
    )


def _top_k(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("u").orderBy(F.desc("score"), F.asc("v"))
    return (
        scored.filter(F.col("score") > 0.0)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("u", "v", "score", "rn")
    )


def jaccard_similarity_top_k(
    edges: DataFrame, k: int = 10, max_fanout: int | None = None
) -> DataFrame:
    """``(u, v, score, rn)`` — top-k Jaccard-similar nodes per u."""
    common = _common_neighbor_counts(edges, max_fanout)
    deg = out_degrees(edges)
    scored = (
        common.join(deg.select(F.col("id").alias("u"), F.col("out_degree").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("out_degree").alias("dv")), "v")
        .select(
            "u",
            "v",
            (
                F.col("common")
                / (F.col("du") + F.col("dv") - F.col("common"))
            ).alias("score"),
        )
    )
    return _top_k(scored, k)


def cosine_similarity_top_k(
    edges: DataFrame, k: int = 10, max_fanout: int | None = None
) -> DataFrame:
    """``(u, v, score, rn)`` — top-k cosine-similar nodes per u."""
    common = _common_neighbor_counts(edges, max_fanout)
    deg = out_degrees(edges)
    scored = (
        common.join(deg.select(F.col("id").alias("u"), F.col("out_degree").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("out_degree").alias("dv")), "v")
        .select(
            "u",
            "v",
            (F.col("common") / F.sqrt(F.col("du") * F.col("dv"))).alias("score"),
        )
    )
    return _top_k(scored, k)
