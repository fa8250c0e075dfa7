"""Deterministic graph generators (reference: graph/TestGraph.scala).

All generators are hash-based (xxhash64 of (src, dst, seed)) rather than
sequential-RNG-based, so they are reproducible under any partitioning and
generate distributively from ``spark.range`` — no driver-side edge lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HASH_SCALE = 2**63 - 1


def complete_graph(spark: SparkSession, n: int) -> DataFrame:
    """K_n with both directions (TestGraph.scala:238-245)."""
    ids = spark.range(n)
    a = ids.select(F.col("id").alias("src"))
    b = ids.select(F.col("id").alias("dst"))
    return a.crossJoin(b).filter(F.col("src") != F.col("dst"))


def random_graph(
    spark: SparkSession, n: int, p_edge: float, seed: int = 42
) -> DataFrame:
    """Directed Erdős–Rényi G(n, p) (TestGraph.scala:270-281 analog).

    Edge (u, v) present iff hash(u, v, seed) < p — per-pair independent
    Bernoulli, deterministic. O(n^2) candidate space; intended for test/bench
    scales (the reference generator is likewise in-memory)."""
    ids = spark.range(n)
    pairs = ids.select(F.col("id").alias("src")).crossJoin(
        ids.select(F.col("id").alias("dst"))
    ).filter(F.col("src") != F.col("dst"))
    u = (F.abs(F.xxhash64("src", "dst", F.lit(seed))) / F.lit(float(HASH_SCALE)))
    return pairs.filter(u < F.lit(float(p_edge)))


def random_undirected_graph(
    spark: SparkSession, n: int, p_edge: float, seed: int = 42
) -> DataFrame:
    """Undirected ER as a mutual (bidirected) edge set
    (TestGraph.scala:289-323 analog)."""
    ids = spark.range(n)
    pairs = ids.select(F.col("id").alias("src")).crossJoin(
        ids.select(F.col("id").alias("dst"))
    ).filter(F.col("src") < F.col("dst"))
    u = (F.abs(F.xxhash64("src", "dst", F.lit(seed))) / F.lit(float(HASH_SCALE)))
    canon = pairs.filter(u < F.lit(float(p_edge)))
    return canon.union(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
