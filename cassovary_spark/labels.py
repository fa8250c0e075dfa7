"""Vertex labels: typed per-node property tables (SURVEY §2.1/§2.9).

Reference: graph/labels/Label.scala:28-79 (a ``Label[Int, L]`` is a named,
typed partial map node -> value; ``Labels`` is a collection keyed by name)
and util/io/LabelsReader.scala:22-70 (reads files named
``nodelabels_<collection>_<name>_<type>.txt`` of ``id value`` lines).

Spark-first: a label is just a typed column; a label COLLECTION is one wide
vertex DataFrame ``(id, <name1>, <name2>, ...)`` built by outer-joining
per-label tables — column pruning then makes ``labelOfNode`` projections free
(DirectedGraph.scala:74-77 labelOfNode -> select two columns).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TYPES = {"int": "int", "long": "long", "string": "string", "double": "double",
          "float": "float", "bool": "boolean", "boolean": "boolean"}

# name is GREEDY (may contain underscores, e.g. page_rank); collection may
# not (validated at write time); type is the last _-segment before .txt
_FNAME = re.compile(
    r"^nodelabels_(?P<coll>[^_]+)_(?P<name>.+)_(?P<typ>[^_.]+)\.txt(\.gz)?$"
)


def read_label_file(
    spark: SparkSession, path: str, name: str, value_type: str = "int",
    separator: str = " ",
) -> DataFrame:
    """One label file of ``id<sep>value`` lines -> ``(id, <name>)``
    (LabelsReader.scala:30-70 single-label path; gzip handled transparently
    by the text source)."""
    typ = _TYPES[value_type]
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), re.escape(separator), 2)
    return lines.select(
        parts.getItem(0).cast("long").alias("id"),
        parts.getItem(1).cast(typ).alias(name),
    )


def read_labels(
    spark: SparkSession, directory: str, collection: str, separator: str = " ",
) -> DataFrame:
    """All ``nodelabels_<collection>_*`` files in ``directory`` -> one wide
    ``(id, <name1>, <name2>, ...)`` DataFrame (LabelsReader.scala:22-28
    directory scan; the per-name file naming convention carries the type).

    Full outer join across labels: a node missing a label gets null — the
    reference's partial-map semantics."""
    out: DataFrame | None = None
    for fn in sorted(os.listdir(directory)):
        m = _FNAME.match(fn)
        if not m or m.group("coll") != collection:
            continue
        one = read_label_file(
            spark, os.path.join(directory, fn), m.group("name"),
            m.group("typ"), separator,
        )
        out = one if out is None else out.join(one, "id", "full")
    if out is None:
        raise FileNotFoundError(
            f"no nodelabels_{collection}_* files under {directory}"
        )
    return out


def write_labels(
    labels: DataFrame, directory: str, collection: str, num_files: int = 1
) -> None:
    """Inverse of read_labels: one text file tree per non-id column.

    ``collection`` must not contain '_' (the filename field separator);
    label names MAY (the reader's name field is greedy).

    ``num_files``: writer parallelism per label (the reference chunks output
    across N writer threads, util/io/GraphWriter.scala:23-62); chunks are
    id-range partitioned so each part file is a contiguous, sorted id range.
    Default 1 keeps the single-file interchange layout."""
    if "_" in collection:
        raise ValueError(
            f"collection {collection!r} must not contain '_' "
            "(filename field separator; label names may)"
        )
    for field in labels.schema.fields:
        if field.name == "id":
            continue
        typ = field.dataType.simpleString()
        typ = {"bigint": "long", "boolean": "bool"}.get(typ, typ)
        path = os.path.join(
            directory, f"nodelabels_{collection}_{field.name}_{typ}.txt"
        )
        one = labels.filter(F.col(field.name).isNotNull()).select(
            "id", F.concat_ws(" ", F.col("id"), F.col(field.name)).alias("value")
        )
        if num_files == 1:
            one = one.coalesce(1)
        else:
            one = one.repartitionByRange(num_files, "id")
        one.sortWithinPartitions("id").select("value").write.mode(
            "overwrite"
        ).text(path)


def label_of_nodes(labels: DataFrame, name: str, node_ids: list[int]) -> DataFrame:
    """``labelOfNode`` for a set of nodes at once
    (DirectedGraph.scala:74-77): a column projection + broadcast semi-join —
    Catalyst prunes every other label column out of the scan."""
    spark = labels.sparkSession
    asked = spark.createDataFrame([(int(x),) for x in node_ids], "id long")
    return labels.select("id", name).join(F.broadcast(asked), "id", "left_semi")
