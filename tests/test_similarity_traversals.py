"""Jaccard top-k (JaccardSimilaritySpec), mutual edges, BFS, walks, PPR."""

from __future__ import annotations

import pytest

from cassovary_spark.operators.mutual import mutual_edge_count
from cassovary_spark.operators.similarity import (
    cosine_similarity_top_k,
    jaccard_similarity_top_k,
)
from cassovary_spark.operators.traversals import (
    all_paths_walk,
    bfs,
    multi_source_bfs,
    personalized_pagerank,
    random_walk_visits,
)
from tests.conftest import G2_MUTUAL, G2_NONMUTUAL, G3, G5, G6, edges_df
from tests.oracles import bfs_oracle, jaccard_topk_oracle, ppr_oracle

# JaccardSimilaritySpec golden top-k on g6, OutDir (FIXTURES.md)
G6_JACCARD = {
    10: [(11, 0.25), (13, 0.25), (15, 0.25)],
    11: [(13, 1.0), (12, 0.5), (10, 0.25)],
    12: [(11, 0.5), (13, 0.5)],
    13: [(11, 1.0), (12, 0.5), (10, 0.25)],
    14: [],
    15: [(10, 0.25)],
}


def topk_dict(df):
    out = {}
    for r in df.orderBy("u", "rn").collect():
        out.setdefault(r["u"], []).append((r["v"], r["score"]))
    return out


def test_jaccard_g6_golden(spark):
    got = topk_dict(jaccard_similarity_top_k(edges_df(spark, G6), k=10))
    for u, exp in G6_JACCARD.items():
        rows = got.get(u, [])
        assert [v for v, _ in rows] == [v for v, _ in exp], f"u={u}: {rows}"
        for (gv, gs), (ev, es) in zip(rows, exp):
            assert gs == pytest.approx(es)


def test_jaccard_matches_oracle_random(spark):
    from cassovary_spark.sources.generators import random_graph

    e = random_graph(spark, 40, 0.1, seed=13)
    pairs = [(r["src"], r["dst"]) for r in e.collect()]
    got = topk_dict(jaccard_similarity_top_k(e, k=5))
    oracle = jaccard_topk_oracle(pairs, 5)
    for u, exp in oracle.items():
        rows = got.get(u, [])
        assert [v for v, _ in rows] == [v for v, _ in exp]
        for (gv, gs), (ev, es) in zip(rows, exp):
            assert gs == pytest.approx(es)


def test_cosine_values(spark):
    got = topk_dict(cosine_similarity_top_k(edges_df(spark, G6), k=10))
    # 11 and 13 share out-neighbors {12,14} fully: cos = 2/sqrt(2*2) = 1
    assert got[11][0] == (13, pytest.approx(1.0))


def test_mutual_edges(spark):
    assert mutual_edge_count(edges_df(spark, G2_MUTUAL)) == 1
    assert mutual_edge_count(edges_df(spark, G2_NONMUTUAL)) == 0
    # g3: 11<->12 reciprocated
    assert mutual_edge_count(edges_df(spark, G3)) == 1


def test_bfs_g5_depths(spark):
    # TraverserSpec: BFS from 10 visits (10,0),(11,1),(12,1),(13,1),(14,2)
    got = {r["id"]: r["depth"] for r in bfs(edges_df(spark, G5), [10]).collect()}
    assert got == {10: 0, 11: 1, 12: 1, 13: 1, 14: 2}


def test_bfs_g3_depths(spark):
    # GraphUtilsSpec.scala:90-92
    got = {r["id"]: r["depth"] for r in bfs(edges_df(spark, G3), [10]).collect()}
    assert got == {10: 0, 11: 1, 12: 1}


def test_bfs_limits(spark):
    e = edges_df(spark, G5)
    # maxDepth=1 stops after first expansion
    got = {r["id"]: r["depth"] for r in bfs(e, [10], max_depth=1).collect()}
    assert got == {10: 0, 11: 1, 12: 1, 13: 1}
    # maxDegree=2: node 10 (deg 3) is not expanded
    got2 = {r["id"]: r["depth"] for r in bfs(e, [10], max_degree=2).collect()}
    assert got2 == bfs_oracle(G5, [10], max_degree=2)
    assert got2 == {10: 0}


def test_multi_source_bfs(spark):
    e = edges_df(spark, G6)
    src = spark.createDataFrame([(10,), (14,)], "source long")
    got = {
        (r["source"], r["id"]): r["depth"]
        for r in multi_source_bfs(e, src).collect()
    }
    for s in (10, 14):
        oracle = bfs_oracle(G6, [s])
        for v, d in oracle.items():
            assert got[(s, v)] == d
    assert len(got) == len(bfs_oracle(G6, [10])) + len(bfs_oracle(G6, [14]))


def test_all_paths_walk_counts(spark):
    # diamond: 1->2, 1->3, 2->4, 3->4 — node 4 reached by 2 paths
    e = edges_df(spark, [(1, 2), (1, 3), (2, 4), (3, 4)])
    got = {r["id"]: r["visits"] for r in all_paths_walk(e, [1], max_depth=3).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2}


def test_random_walk_two_node_cycle(spark):
    # GraphUtilsSpec.scala:55-75: g2_mutual, reset 0: visits split
    # ceil/floor of steps between the nodes — deterministic (single neighbor)
    e = edges_df(spark, G2_MUTUAL)
    got = {
        r["id"]: r["visits"]
        for r in random_walk_visits(e, [1], num_steps=7, num_walkers=1).collect()
    }
    assert got == {1: 4, 2: 4}  # 8 positions incl. start


def test_random_walk_conservation(spark):
    e = edges_df(spark, G6)
    df = random_walk_visits(e, [10], num_steps=5, reset_prob=0.3, num_walkers=40)
    total = sum(r["visits"] for r in df.collect())
    assert total == 40 * 6


def test_personalized_pagerank_oracle(spark):
    e = edges_df(spark, G6)
    got = {r["id"]: r["score"] for r in personalized_pagerank(e, [10]).collect()}
    oracle = ppr_oracle(G6, [10])
    for k in oracle:
        assert got[k] == pytest.approx(oracle[k], abs=1e-9)
    # mass concentrates near the seed
    assert got[10] > 0.15
