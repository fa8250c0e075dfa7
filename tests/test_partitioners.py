"""Partitioner family semantics (graph/distributed/Partitioner.scala analogs)."""

from __future__ import annotations

import os

from cassovary_spark.plans import (
    hash_dest_mapper,
    hash_source_and_dest_mapper,
    hash_source_mapper,
    random_node_mapper,
    split_graph,
)
from tests.conftest import G6, edges_df


def test_source_mappers_keep_node_records_together(spark):
    e = edges_df(spark, G6)
    for mapper in (lambda d: random_node_mapper(d, 4), lambda d: hash_source_mapper(d, 4)):
        m = mapper(e).collect()
        by_src = {}
        for r in m:
            by_src.setdefault(r["src"], set()).add(r["instance"])
            assert 0 <= r["instance"] < 4
        assert all(len(v) == 1 for v in by_src.values())
        assert len(m) == len(G6)


def test_dest_mapper_splits_by_destination(spark):
    e = edges_df(spark, G6)
    m = hash_dest_mapper(e, 4).collect()
    by_dst = {}
    for r in m:
        by_dst.setdefault(r["dst"], set()).add(r["instance"])
    assert all(len(v) == 1 for v in by_dst.values())


def test_dual_mapper_resolves_both_endpoints_everywhere(spark):
    e = edges_df(spark, G6)
    m = hash_source_and_dest_mapper(e, 3).collect()
    assert len(m) == 2 * len(G6)
    # every edge has one copy on its src instance and one on its dst instance
    src_inst = {r["src"]: r["instance"] for r in m if r["orientation"] == "src"}
    dst_inst = {r["dst"]: r["instance"] for r in m if r["orientation"] == "dst"}
    for r in m:
        if r["orientation"] == "src":
            assert r["instance"] == src_inst[r["src"]]
        else:
            assert r["instance"] == dst_inst[r["dst"]]


def test_split_graph_writes_instance_dirs(spark, tmp_path):
    e = edges_df(spark, G6)
    out = str(tmp_path / "split")
    split_graph(hash_source_mapper(e, 3), out)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("instance="))
    assert len(dirs) >= 2  # 6 sources over 3 buckets: at least 2 non-empty
    back = spark.read.parquet(out)
    assert {(r["src"], r["dst"]) for r in back.collect()} == set(G6)
