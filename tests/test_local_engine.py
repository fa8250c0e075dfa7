"""Adaptive-engine equality: the local (numpy) path must reproduce the
distributed path's results on the same graphs — same recurrences, only
float summation order may differ (tolerance 1e-9 on scores, exact on
integer/label outputs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def graph(spark):
    from cassovary_spark.sources.generators import random_graph

    # includes dangling nodes and multiple components with high probability
    return random_graph(spark, 150, 0.02, seed=23).persist()


def _score_map(df, col):
    return {r["id"]: r[col] for r in df.collect()}


def test_pagerank_local_matches_distributed(spark, graph):
    from cassovary_spark.operators import pagerank

    loc = pagerank(graph, max_iterations=12, engine="local")
    dist = pagerank(graph, max_iterations=12, engine="distributed")
    assert loc.iterations == dist.iterations
    assert abs(loc.error - dist.error) < 1e-9
    lm, dm = _score_map(loc.ranks, "pagerank"), _score_map(dist.ranks, "pagerank")
    assert lm.keys() == dm.keys()
    assert all(abs(lm[k] - dm[k]) < 1e-9 for k in lm)


def test_pagerank_auto_uses_local_on_small_graph(spark, graph):
    from cassovary_spark.operators import pagerank

    res = pagerank(graph, max_iterations=3)
    assert res.history and res.history[0].get("engine") == "local"


def test_hits_local_matches_distributed(spark, graph):
    from cassovary_spark.operators import hits

    loc = hits(graph, max_iterations=8, engine="local")
    dist = hits(graph, max_iterations=8, engine="distributed")
    assert loc.iterations == dist.iterations
    for col in ("hub", "authority"):
        lm, dm = _score_map(loc.scores, col), _score_map(dist.scores, col)
        assert lm.keys() == dm.keys()
        assert all(abs(lm[k] - dm[k]) < 1e-9 for k in lm), col


def test_cc_local_matches_distributed(spark, graph):
    from cassovary_spark.operators import connected_components

    loc = _score_map(connected_components(graph, engine="local"), "component")
    dist = _score_map(connected_components(graph, engine="distributed"), "component")
    assert loc == dist


def test_lpa_local_matches_distributed(spark, graph):
    from cassovary_spark.operators import label_propagation

    loc = _score_map(label_propagation(graph, max_iterations=5, engine="local"), "label")
    dist = _score_map(
        label_propagation(graph, max_iterations=5, engine="distributed"), "label"
    )
    assert loc == dist


def test_ppr_local_matches_distributed(spark, graph):
    from cassovary_spark.operators import personalized_pagerank

    seeds = [r["src"] for r in graph.select("src").distinct().limit(3).collect()]
    loc = _score_map(
        personalized_pagerank(graph, seeds, max_iterations=10, engine="local"), "score"
    )
    dist = _score_map(
        personalized_pagerank(graph, seeds, max_iterations=10, engine="distributed"),
        "score",
    )
    assert loc.keys() == dist.keys()
    assert all(abs(loc[k] - dist[k]) < 1e-9 for k in loc)


def test_bfs_local_matches_distributed(spark, graph):
    from cassovary_spark.operators import bfs

    seed = graph.select("src").first()["src"]
    for kwargs in ({}, {"max_depth": 2}, {"max_degree": 2}):
        loc = {(r["id"], r["depth"])
               for r in bfs(graph, [seed, 999_999], engine="local", **kwargs).collect()}
        dist = {(r["id"], r["depth"])
                for r in bfs(graph, [seed, 999_999], engine="distributed", **kwargs).collect()}
        assert loc == dist, kwargs


def test_triangles_local_matches_distributed(spark):
    from cassovary_spark.operators import triangle_count
    from cassovary_spark.sources.generators import random_undirected_graph, complete_graph

    er = random_undirected_graph(spark, 60, 0.15, seed=5)
    assert triangle_count(er, engine="local") == triangle_count(er, engine="distributed")
    k6 = complete_graph(spark, 6)
    assert triangle_count(k6, engine="local") == 20
