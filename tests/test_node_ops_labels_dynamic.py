"""node_ops accessors, label tables, and the dynamic-graph mutation log."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cassovary_spark.dynamic import DynamicGraph
from cassovary_spark.labels import (
    label_of_nodes,
    read_labels,
    write_labels,
)
from cassovary_spark.operators.node_ops import (
    exists_node,
    intersect_neighbors,
    is_neighbor,
    neighbor_counts,
    neighbor_lists,
    random_neighbors,
)
from tests.conftest import G6, edges_df

ADJ_OUT = {
    10: [11, 12, 13], 11: [12, 14], 12: [14], 13: [12, 14],
    14: [15], 15: [10, 11],
}
ADJ_IN = {
    11: [10, 15], 12: [10, 11, 13], 13: [10], 14: [11, 12, 13],
    15: [14], 10: [15],
}


def test_neighbor_lists_and_counts(spark):
    e = edges_df(spark, G6)
    out = {r["id"]: list(r["nbrs"]) for r in neighbor_lists(e, "out").collect()}
    assert out == ADJ_OUT
    inn = {r["id"]: list(r["nbrs"]) for r in neighbor_lists(e, "in").collect()}
    assert inn == ADJ_IN
    lim = {r["id"]: list(r["nbrs"]) for r in neighbor_lists(e, "out", 2).collect()}
    assert lim == {k: v[:2] for k, v in ADJ_OUT.items()}
    cnt = {r["id"]: r["count"] for r in neighbor_counts(e, "out").collect()}
    assert cnt == {k: len(v) for k, v in ADJ_OUT.items()}


def test_is_neighbor_and_exists(spark):
    e = edges_df(spark, G6)
    pairs = spark.createDataFrame(
        [(10, 11), (10, 14), (14, 15), (15, 12)], "id long, candidate long"
    )
    got = {(r["id"], r["candidate"]): r["is_neighbor"] for r in is_neighbor(e, pairs).collect()}
    assert got == {(10, 11): True, (10, 14): False, (14, 15): True, (15, 12): False}

    ex = {r["id"]: r["exists"] for r in exists_node(e, [10, 15, 99]).collect()}
    assert ex == {10: True, 15: True, 99: False}


def test_intersect_and_random_neighbors(spark):
    e = edges_df(spark, G6)
    got = {r["id"]: list(r["common"]) for r in intersect_neighbors(e, [12, 14, 15]).collect()}
    # nodes with no intersection simply don't appear (semi-join drops them):
    # 15's nbrs {10, 11} miss the given set entirely
    assert got == {10: [12], 11: [12, 14], 12: [14], 13: [12, 14], 14: [15]}

    samp = {r["id"]: list(r["sample"]) for r in random_neighbors(e, "out", 5, seed=3).collect()}
    assert set(samp) == set(ADJ_OUT)
    for i, s in samp.items():
        assert len(s) == 5 and all(x in ADJ_OUT[i] for x in s)


def test_labels_roundtrip(spark, tmp_path):
    labels = spark.createDataFrame(
        [(1, 7, "red"), (2, 9, None), (3, None, "blue")],
        "id long, score int, color string",
    )
    d = str(tmp_path / "lab")
    write_labels(labels, d, "test")
    names = sorted(os.listdir(d))
    assert names == [
        "nodelabels_test_color_string.txt",
        "nodelabels_test_score_int.txt",
    ]
    # spark writes directories; read_labels must accept them transparently
    back = read_labels(spark, d, "test")
    rows = {r["id"]: (r["score"], r["color"]) for r in back.collect()}
    assert rows == {1: (7, "red"), 2: (9, None), 3: (None, "blue")}

    one = label_of_nodes(back, "color", [1, 3])
    assert {(r["id"], r["color"]) for r in one.collect()} == {(1, "red"), (3, "blue")}


def test_dynamic_graph_mutations(spark, tmp_path):
    base = edges_df(spark, G6)
    g = DynamicGraph(base)
    # no deltas -> identical
    assert g.current_edges().count() == len(G6)

    g.add_edge(10, 14).add_edge(10, 11)  # one new, one duplicate of base
    g.remove_edge(14, 15)
    g.remove_edge(99, 99)  # absent -> no-op
    cur = {(r["src"], r["dst"]) for r in g.current_edges().collect()}
    expect = (set(G6) | {(10, 14)}) - {(14, 15)}
    assert cur == expect

    # last-writer-wins: re-add a removed edge, remove an added one
    g.add_edge(14, 15)
    g.remove_edge(10, 14)
    cur = {(r["src"], r["dst"]) for r in g.current_edges().collect()}
    assert cur == set(G6)

    # compaction folds the log into a new base and keeps the view stable
    g.add_edge(1, 2)
    g2 = g.compact(str(tmp_path / "snap"))
    assert g2._deltas == []
    cur2 = {(r["src"], r["dst"]) for r in g2.current_edges().collect()}
    assert cur2 == set(G6) | {(1, 2)}


def test_label_names_with_underscores_roundtrip(spark, tmp_path):
    """Label NAMES may contain underscores (the filename parser's name field
    is greedy); collections may not (validated at write)."""
    import pytest as _pytest

    d = str(tmp_path / "lbl_us")
    labels = spark.createDataFrame(
        [(1, 10), (2, 20)], "id long, page_rank_tier int"
    )
    write_labels(labels, d, "c")
    back = {r["id"]: r["page_rank_tier"] for r in read_labels(spark, d, "c").collect()}
    assert back == {1: 10, 2: 20}
    with _pytest.raises(ValueError):
        write_labels(labels, d, "my_coll")


def test_dynamic_repeated_compact(spark, tmp_path):
    """compact() to the same path twice must not fail (snapshot subdirs, the
    Iceberg pattern) — overwriting the directory the base reads from raises
    in Spark."""
    from cassovary_spark.dynamic import DynamicGraph

    base = spark.createDataFrame([(1, 2)], "src long, dst long")
    g = DynamicGraph(base).add_edge(2, 3)
    p = str(tmp_path / "snaps")
    g2 = g.compact(p)
    g3 = g2.add_edge(3, 4).compact(p)
    got = {(r["src"], r["dst"]) for r in g3.current_edges().collect()}
    assert got == {(1, 2), (2, 3), (3, 4)}


def test_transcripts_real_conv_ids(spark):
    """Non-synthetic conv_id formats (UUID-ish) derive non-null vertex ids
    via the hash-ordinal fallback — edges are not silently dropped."""
    from cassovary_spark.sources import turn_edges

    t = spark.createDataFrame(
        [("a1b2-uuid", 0), ("a1b2-uuid", 1), ("a1b2-uuid", 2)],
        "conv_id string, turn_idx int",
    )
    e = turn_edges(t).collect()
    assert len(e) == 2
    assert all(r["src"] is not None and r["dst"] is not None for r in e)


def test_dynamic_apply_delta_df(spark, tmp_path):
    """DataFrame deltas compose with API edits in call order; stream ->
    delta log -> compact -> algorithm runs end-to-end without driver
    materialization of the deltas."""
    from cassovary_spark.dynamic import DynamicGraph
    from cassovary_spark.operators import pagerank

    base = edges_df(spark, [(1, 2), (2, 3)])
    g = DynamicGraph(base)
    g.add_edge(3, 4)                      # epoch 0 (literal)
    deltas = spark.createDataFrame(
        [(2, 3, -1, 0), (4, 5, 1, 1), (4, 5, -1, 2), (5, 6, 1, 3)],
        "src long, dst long, op int, seq long",
    )
    g.apply_delta_df(deltas)              # epoch 1: remove 2->3, net-noop 4->5, add 5->6
    g.add_edge(2, 3)                      # epoch 2: re-add beats epoch-1 removal
    cur = {(r["src"], r["dst"]) for r in g.current_edges().collect()}
    assert cur == {(1, 2), (2, 3), (3, 4), (5, 6)}
    # last-writer-wins ACROSS epochs: later df delta removes an API add
    g.apply_delta_df(
        spark.createDataFrame([(3, 4, -1, 0)], "src long, dst long, op int, seq long")
    )
    cur2 = {(r["src"], r["dst"]) for r in g.current_edges().collect()}
    assert cur2 == {(1, 2), (2, 3), (5, 6)}
    # compact + run an algorithm on the snapshot
    g2 = g.compact(str(tmp_path / "snap"))
    assert {(r["src"], r["dst"]) for r in g2.base.collect()} == cur2
    assert pagerank(g2.current_edges(), max_iterations=3).ranks.count() == 5
