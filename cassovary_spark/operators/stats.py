"""Whole-graph summary statistics.

The reference computes per-node degree summaries on load
(graph/ArrayBasedDirectedGraph.scala:283-380 tracks node/edge counts and
max ids); assortativity is the standard network-statistics composition a
reference user derives from those accessors. Single-pass DataFrame
programs — no iteration, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassovary_spark.graph import mutualize


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Pearson correlation of endpoint degrees over the undirected edge set
    (Newman 2002, "Assortative mixing in networks") as a 1-row
    ``(assortativity double)`` frame.

    Plan: one groupBy for degrees, two joins to decorate each edge end
    (both O(E) but the degree table is O(V) and broadcastable on real
    clusters), one corr() aggregate. Using the bidirected edge list makes
    the measure symmetric without a union of (d1,d2)/(d2,d1)."""
    und = mutualize(edges)
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    return (
        und.join(deg.withColumnRenamed("id", "src").withColumnRenamed("d", "d_src"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("d", "d_dst"), "dst")
        # spelled-out Pearson r with try_divide: a regular (e.g. complete)
        # graph has zero degree variance, where corr() under ANSI mode
        # raises DIVIDE_BY_ZERO; NULL is the correct "undefined" answer
        .agg(
            F.round(
                F.expr(
                    "try_divide(covar_samp(d_src, d_dst),"
                    " stddev_samp(d_src) * stddev_samp(d_dst))"
                ),
                6,
            ).alias("assortativity")
        )
    )


def degree_distribution(edges: DataFrame, direction: str = "out") -> DataFrame:
    """``(degree, n_nodes)`` histogram — the scale-friendly summary of a
    power-law corpus graph (two partial-aggregating groupBys, no joins)."""
    key = {"out": "src", "in": "dst"}.get(direction)
    if key is None:
        raise ValueError(f"direction must be 'out' or 'in', got {direction!r}")
    return (
        edges.groupBy(F.col(key).alias("id"))
        .agg(F.count("*").alias("degree"))
        .groupBy("degree")
        .agg(F.count("*").alias("n_nodes"))
    )
