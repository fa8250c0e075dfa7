"""HITS (HitsSpec golden vectors) + degree/closeness centrality
(DegreeCentralitySpec / ClosenessCentralitySpec golden values)."""

from __future__ import annotations

import pytest

from cassovary_spark.operators.centrality import (
    closeness_centrality,
    degree_centrality,
)
from cassovary_spark.operators.hits import hits
from tests.conftest import G6, edges_df
from tests.oracles import closeness_oracle, hits_oracle


# HitsSpec "return proper values when normalized" on g6 (FIXTURES.md):
G6_HUBS = {10: 0.2576, 11: 0.2716, 12: 0.1234, 13: 0.2716, 14: 0.0000, 15: 0.0757}
G6_AUTH = {10: 0.0355, 11: 0.1562, 12: 0.3753, 13: 0.1207, 14: 0.3123, 15: 0.0000}

# ClosenessCentralitySpec / DegreeCentralitySpec use g6WithEmptyNodes:
# g6 + isolated vertices 0, 1 (graph/TestGraph.scala nodeSeqIteratorWithEmpty)
G6E_CLOSENESS_NORM = {
    0: 0.0, 1: 0.0,
    10: 0.446, 11: 0.325, 12: 0.275, 13: 0.357, 14: 0.324, 15: 0.446,
}
G6E_CLOSENESS_RAW = {
    0: 0.0, 1: 0.0,
    10: 0.625, 11: 0.455, 12: 0.385, 13: 0.500, 14: 0.455, 15: 0.625,
}
G6E_VERTS = [0, 1, 10, 11, 12, 13, 14, 15]


def as_dict(df, col):
    return {r["id"]: r[col] for r in df.collect()}


def test_hits_g6_golden(spark):
    res = hits(edges_df(spark, G6))
    got = {r["id"]: (r["hub"], r["authority"]) for r in res.scores.collect()}
    for k in G6_HUBS:
        assert got[k][0] == pytest.approx(G6_HUBS[k], abs=5e-4)
        assert got[k][1] == pytest.approx(G6_AUTH[k], abs=5e-4)


def test_hits_matches_oracle_random(spark):
    from cassovary_spark.sources.generators import random_graph

    e = random_graph(spark, 50, 0.08, seed=5)
    pairs = [(r["src"], r["dst"]) for r in e.collect()]
    res = hits(e, max_iterations=40)
    oh, oa, oit, _ = hits_oracle(pairs, max_iterations=40)
    got = {r["id"]: (r["hub"], r["authority"]) for r in res.scores.collect()}
    assert res.iterations == oit
    for k in oh:
        assert got[k][0] == pytest.approx(oh[k], abs=1e-9)
        assert got[k][1] == pytest.approx(oa[k], abs=1e-9)


def test_degree_centrality_g6_with_empty(spark):
    # DegreeCentralitySpec golden: in-degree / 7 on g6WithEmptyNodes
    e = edges_df(spark, G6)
    verts = spark.createDataFrame([(v,) for v in G6E_VERTS], "id long")
    got = as_dict(
        degree_centrality(e, direction="in", normalize=True, vertices=verts),
        "centrality",
    )
    indeg = {0: 0, 1: 0, 10: 1, 11: 2, 12: 3, 13: 1, 14: 3, 15: 1}
    for k, v in indeg.items():
        assert got[k] == pytest.approx(v / 7)
    raw = as_dict(
        degree_centrality(e, direction="out", normalize=False, vertices=verts),
        "centrality",
    )
    outdeg = {0: 0, 1: 0, 10: 3, 11: 2, 12: 1, 13: 2, 14: 1, 15: 2}
    for k, v in outdeg.items():
        assert raw[k] == pytest.approx(float(v))


def test_closeness_g6_with_empty_golden(spark):
    e = edges_df(spark, G6)
    verts = spark.createDataFrame([(v,) for v in G6E_VERTS], "id long")
    got = as_dict(closeness_centrality(e, normalize=True, vertices=verts), "centrality")
    for k, v in G6E_CLOSENESS_NORM.items():
        assert got[k] == pytest.approx(v, abs=5e-3)
    raw = as_dict(
        closeness_centrality(e, normalize=False, vertices=verts), "centrality"
    )
    for k, v in G6E_CLOSENESS_RAW.items():
        assert raw[k] == pytest.approx(v, abs=5e-3)


def test_closeness_matches_oracle_random(spark):
    from cassovary_spark.sources.generators import random_graph

    e = random_graph(spark, 40, 0.07, seed=9)
    pairs = [(r["src"], r["dst"]) for r in e.collect()]
    got = as_dict(closeness_centrality(e), "centrality")
    oracle = closeness_oracle(pairs)
    assert got.keys() == oracle.keys()
    for k in oracle:
        assert got[k] == pytest.approx(oracle[k], abs=1e-9)
