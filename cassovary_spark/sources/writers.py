"""Graph sinks (reference: util/io/GraphWriter.scala:23-62,
graph/distributed/GraphFilesSplitter.scala:28-99).

Text formats exist for interchange with reference tooling; the scale-native
sink is partitioned parquet (Iceberg in production) bucketed by src.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_edge_list(edges: DataFrame, path: str, sep: str = " ", sort_by_id: bool = False) -> None:
    """Edge-per-line text sink."""
    if sort_by_id:
        edges = edges.orderBy("src", "dst")
    out = edges.select(
        F.concat_ws(sep, F.col("src").cast("string"), F.col("dst").cast("string")).alias(
            "value"
        )
    )
    out.write.mode("overwrite").text(path)


def write_adjacency_list(edges: DataFrame, path: str) -> None:
    """Adjacency-list text sink: ``id count`` header + neighbor lines,
    neighbors sorted (GraphWriter's sortByIds analog)."""
    adj = (
        edges.groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
        .orderBy("src")
        .select(
            F.concat_ws(
                "\n",
                F.concat_ws(" ", F.col("src").cast("string"), F.size("nbrs").cast("string")),
                F.concat_ws("\n", F.transform("nbrs", lambda x: x.cast("string"))),
            ).alias("value")
        )
    )
    adj.write.mode("overwrite").text(path)


def write_partitioned_edges(
    edges: DataFrame, path: str, num_buckets: int = 32
) -> None:
    """Scale-native sink: parquet partitioned by ``pmod(hash(src), k)`` —
    the HashSourceMapper layout (graph/distributed/Partitioner.scala:41-43);
    under Iceberg this is the ``bucket(k, src)`` partition spec.

    The placement hash is owned by plans.partitioners.hash_source_mapper —
    one definition, so the sink and the splitter can never diverge. The
    partition column stays named ``bucket`` (this sink's on-disk contract)."""
    from cassovary_spark.plans import hash_source_mapper

    bucketed = hash_source_mapper(edges, num_buckets).withColumnRenamed(
        "instance", "bucket"
    )
    (
        bucketed.repartition(num_buckets, "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
