"""Core edge-table representation and graph-shaped primitives.

The engine's universal data model is an ``edges(src: long, dst: long)``
DataFrame — the distributed analog of the reference's adjacency storage
(``graph/ArrayBasedDirectedGraph.scala``, ``graph/SharedArrayBasedDirectedGraph.scala``).
"Direction" is not a storage mode here (reference ``StoredGraphDir``,
graph/DirectedGraph.scala:20-32): it is which column you group or join on, and
``reverse_edges`` / ``mutualize`` produce the other orientations for free.

All helpers are lazy DataFrame transforms; nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EDGE_SCHEMA = "src long, dst long"


def normalize_edges(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    dedup: bool = True,
    drop_self_loops: bool = False,
) -> DataFrame:
    """Canonical (src, dst) long columns; optional dedup / self-loop removal.

    Reference analog: ListOfEdgesGraphReader's ``removeDuplicates`` option
    (util/io/ListOfEdgesGraphReader.scala:63-211).
    """
    out = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    if drop_self_loops:
        out = out.filter(F.col("src") != F.col("dst"))
    if dedup:
        out = out.dropDuplicates(["src", "dst"])
    return out


def reverse_edges(edges: DataFrame) -> DataFrame:
    """Transpose: the reference's OnlyIn storage view (graph/GraphDir.scala:19-37)."""
    return edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))


def mutualize(edges: DataFrame) -> DataFrame:
    """Directed -> undirected-as-bidirected: union with the transpose, dedup,
    drop self-loops. Reference analog: StoredGraphDir.Mutual."""
    return (
        edges.select("src", "dst")
        .union(reverse_edges(edges))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def canonicalize_undirected(edges: DataFrame) -> DataFrame:
    """One canonical row (a < b) per undirected edge.

    Reference analog: the min/max 64-bit edge packing used for mutual-edge
    counting (graph/DirectedGraphUtils.scala:33-58) and the a<b wedge
    convention in algorithms/TriangleCount.scala.
    """
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .dropDuplicates(["src", "dst"])
    )


def vertices_of(edges: DataFrame) -> DataFrame:
    """Distinct vertex ids as ``(id)``. The reference's node set is whatever
    appears as a source OR destination (graph/ArrayBasedDirectedGraph.scala:283-380
    creates nodes for in-only ids too)."""
    return (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def out_degrees(edges: DataFrame) -> DataFrame:
    """``(id, out_degree)`` for ids with >=1 out-edge (graph/Node.scala:236-241)."""
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_degree")
    )


def in_degrees(edges: DataFrame) -> DataFrame:
    """``(id, in_degree)`` for ids with >=1 in-edge."""
    return edges.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("in_degree"))


def degrees(edges: DataFrame) -> DataFrame:
    """``(id, out_degree, in_degree)`` over the full vertex set, zero-filled."""
    return (
        vertices_of(edges)
        .join(out_degrees(edges), "id", "left")
        .join(in_degrees(edges), "id", "left")
        .fillna(0, subset=["out_degree", "in_degree"])
    )


def undirected_degrees(edges: DataFrame) -> DataFrame:
    """``(id, degree)`` where degree counts distinct undirected neighbors."""
    m = mutualize(edges)
    return m.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))


def graph_stats(edges: DataFrame) -> dict:
    """nodeCount / edgeCount / maxNodeId (graph/DirectedGraph.scala:42,64,82-84).

    One action; returns a plain dict (driver-side scalars, not data rows).
    """
    row = (
        vertices_of(edges)
        .agg(F.count("*").alias("node_count"), F.max("id").alias("max_node_id"))
        .crossJoin(edges.agg(F.count("*").alias("edge_count")))
        .first()
    )
    return {
        "node_count": row["node_count"],
        "edge_count": row["edge_count"],
        "max_node_id": row["max_node_id"],
    }


def densify_ids(df: DataFrame, id_col: str, num_partitions: int | None = None) -> DataFrame:
    """NodeNumberer analog (util/SequentialNodeNumberer.scala:22): a
    deterministic dictionary ``(external_id, id)`` with dense ids 0..n-1.

    Deterministic because ids are assigned by sort order of the external id
    (the reference assigns by encounter order, which is file order — not
    reproducible across partitionings; sort order is).

    Scale: a naive ``row_number() over (order by external_id)`` funnels every
    distinct id through ONE task. Here the ranking is distributed: range-
    partition by external id (so partition i's keys all precede partition
    i+1's), rank WITHIN each partition in parallel, then add per-partition
    cumulative offsets (p scalars collected from a count aggregate and folded
    back in as a literal map). Output is byte-identical to the global-window
    form.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = (
        df.select(F.col(id_col).alias("external_id"))
        .distinct()
        .repartitionByRange(p, "external_id")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    cnt = {
        r["pid"]: r["n"]
        for r in d.groupBy("pid").agg(F.count("*").alias("n")).collect()
    }
    if not cnt:
        return spark.createDataFrame([], df.select(F.col(id_col).alias("external_id")).schema.add("id", "long"))
    # RangePartitioner assigns ascending key ranges to ascending partition
    # ids, so the cumulative counts in pid order are the global rank offsets
    offsets, acc = {}, 0
    for pid in sorted(cnt):
        offsets[pid] = acc
        acc += cnt[pid]
    omap = F.create_map(
        *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
    )
    w = Window.partitionBy("pid").orderBy("external_id")
    return (
        d.withColumn("rk", F.row_number().over(w).cast("long"))
        .select(
            "external_id",
            (F.element_at(omap, F.col("pid")) + F.col("rk") - 1).alias("id"),
        )
    )


def read_node_numberer(df_or_path, spark=None, separator: str = " ") -> DataFrame:
    """MapNodeNumberer analog (util/MapNodeNumberer.scala:45-64,
    forStringsFromFile): load a NAMED external<->internal id dictionary from
    a text file of ``name<sep>id`` lines. Returns ``(external_id string,
    id long)`` — the same dictionary shape ``densify_ids`` derives from data,
    so ``edges_from_external`` composes with either.

    Like the reference, duplicate names AND duplicate ids are errors (both
    directions of the map must be functions); the checks are distributed
    aggregations, not driver-side sets.
    """
    if isinstance(df_or_path, str):
        if spark is None:
            raise ValueError("read_node_numberer(path, spark=...) needs a session")
        raw = spark.read.text(df_or_path)
        parts = F.split(F.col("value"), separator)
        d = raw.select(
            parts.getItem(0).alias("external_id"),
            parts.getItem(1).cast("long").alias("id"),
        )
    else:
        d = df_or_path.select("external_id", F.col("id").cast("long"))
    d = d.persist()
    bad_id = d.filter(F.col("id").isNull()).count()
    if bad_id:
        raise ValueError(f"{bad_id} lines with non-integer ids")
    for key, label in (("external_id", "name"), ("id", "id")):
        dup = (
            d.groupBy(key).agg(F.count("*").alias("n")).filter(F.col("n") > 1).first()
        )
        if dup is not None:
            raise ValueError(f"Duplicate {label} found: {dup[key]}")
    return d


def edges_from_external(
    edges: DataFrame, dictionary: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Encode external-id edges through the dictionary (broadcast joins).

    Edges are projected to the two key columns first — an extra caller
    column named ``id`` would otherwise collide with the dictionary's and
    make the rename ambiguous."""
    d = F.broadcast(dictionary)
    edges = edges.select(src, dst)
    return (
        edges.join(d.withColumnRenamed("external_id", src), src)
        .withColumnRenamed("id", "_src_id")
        .join(d.withColumnRenamed("external_id", dst), dst)
        .withColumnRenamed("id", "_dst_id")
        .select(F.col("_src_id").alias("src"), F.col("_dst_id").alias("dst"))
    )
