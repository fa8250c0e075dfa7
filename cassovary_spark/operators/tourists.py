"""Tourists: side-state collectors over traversal/walk event logs.

The reference attaches mutable per-visit collectors to traversals
(graph/tourist/*.scala): VisitsCounter (visit multiplicity,
VisitsCounter.scala:26-57), PrevNbrCounter (top-k previous neighbors per
node, PrevNbrCounter.scala:25-50), PathsCounter / DirectedPathCollection
(top-k directed paths per node, PathsCounter.scala:29-60,
DirectedPathCollection.scala:7-31), and InfoKeeper (first-or-latest value
per node, InfoKeeper.scala:22-62).

Spark-first design: traversals emit an immutable EVENT LOG DataFrame
``(walker, step, id, prev, path?)`` and each tourist is a plain aggregation
over it — the collector state never lives in driver memory, so a walk with
10^9 events aggregates exactly like any other fact table (partial map-side
combine, one shuffle on the group key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ranked_list(col: str):
    """rank-ordered list aggregation: ``collect_list`` after a window does
    NOT guarantee window order — collect (rn, value) structs, sort by rn,
    project the value."""
    return F.transform(
        F.sort_array(F.collect_list(F.struct("rn", col))), lambda s: s[col]
    )


def visits_counter(events: DataFrame, weight_col: str | None = None) -> DataFrame:
    """Visit multiplicity per node, ordered (count desc, id asc) like
    VisitsCounter.infoAllNodes iteration (VisitsCounter.scala:40-57).

    ``events`` needs an ``id`` column (one row per visit), or — for WEIGHTED
    event logs like ``all_paths_walk(events=True)`` where one row stands for
    ``cnt`` identical visits — pass ``weight_col``."""
    agg = F.count("*") if weight_col is None else F.sum(weight_col)
    return (
        events.groupBy("id")
        .agg(agg.alias("visits"))
        .orderBy(F.desc("visits"), F.asc("id"))
    )


def prev_nbr_counter(
    events: DataFrame, k: int = 3, weight_col: str | None = None
) -> DataFrame:
    """Top-k previous neighbors per node by visit count
    (PrevNbrCounter.scala:25-50; ties break (count desc, prev asc) — the
    reference's priority-queue tie order is unspecified, fixed here for
    determinism).

    ``events`` needs ``(id, prev)``; rows with null prev (walk starts /
    resets) are ignored. ``weight_col`` treats each row as that many
    encounters (weighted logs: ``all_paths_walk(events=True)``).
    Returns ``(id, prev_nbrs array<long>)``."""
    agg = F.count("*") if weight_col is None else F.sum(weight_col)
    counts = (
        events.filter(F.col("prev").isNotNull())
        .groupBy("id", "prev")
        .agg(agg.alias("cnt"))
    )
    w = Window.partitionBy("id").orderBy(F.desc("cnt"), F.asc("prev"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("id")
        .agg(_ranked_list("prev").alias("prev_nbrs"))
    )


def paths_counter(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k directed paths (from a walk's home node) per node by frequency
    (PathsCounter.scala:29-60; DirectedPathCollection.topPathsTill ordering
    count desc, then lexicographic path asc for determinism).

    ``events`` needs ``(id, path array<long>)`` where ``path`` is the full
    directed path the walker took from its last reset to ``id`` (inclusive).
    Returns ``(id, paths array<array<long>>)``."""
    counts = (
        events.filter(F.col("path").isNotNull())
        .groupBy("id", "path")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("id").orderBy(F.desc("cnt"), F.asc("path"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("id")
        .agg(_ranked_list("path").alias("paths"))
    )


def info_keeper(events: DataFrame, value_col: str, first: bool = True) -> DataFrame:
    """First-or-latest recorded value per node (InfoKeeper.scala:22-62,
    ``onlyOnce`` flag). ``events`` needs ``(step, id, <value_col>)``."""
    w = Window.partitionBy("id").orderBy(
        F.asc("step") if first else F.desc("step")
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", value_col)
    )
