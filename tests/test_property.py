"""Property-based testing (hypothesis) against the pure-Python oracles:
random small multigraphs — duplicate edges, self-loops, disconnected
vertices, cycles — must agree with the reference-semantics oracles exactly
(components, LPA, triangles, BFS) or to float tolerance (PageRank).

The reference's spec style (random generated graphs checked against a naive
implementation, e.g. TriangleCountSpec's ER graphs) generalized: hypothesis
shrinks any counterexample to a minimal edge list.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import edges_df
from tests.oracles import (
    bfs_oracle,
    components_oracle,
    lpa_oracle,
    pagerank_oracle,
    triangles_oracle,
)

edge_lists = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)),
    min_size=1,
    max_size=24,
)

# each example spins real Spark supersteps (~1-2s fixed cost per superstep
# at toy scale) — 5 shrink-capable examples per property keeps the whole
# module under ~5 min while still exercising self-loops, duplicate edges,
# cycles, and disconnected vertices
SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    print_blob=True,
)


@settings(**SETTINGS)
@given(pairs=edge_lists)
def test_components_property(spark, pairs):
    from cassovary_spark.operators import connected_components

    got = {
        r["id"]: r["component"]
        for r in connected_components(edges_df(spark, pairs)).collect()
    }
    assert got == components_oracle(pairs)


@settings(**SETTINGS)
@given(pairs=edge_lists)
def test_lpa_property(spark, pairs):
    from cassovary_spark.operators import label_propagation

    got = {
        r["id"]: r["label"]
        for r in label_propagation(
            edges_df(spark, pairs), max_iterations=6
        ).collect()
    }
    assert got == lpa_oracle(pairs, max_iterations=6)


@settings(**SETTINGS)
@given(pairs=edge_lists)
def test_triangles_property(spark, pairs):
    from cassovary_spark.operators import triangle_count

    assert triangle_count(edges_df(spark, pairs)) == triangles_oracle(pairs)


@settings(**SETTINGS)
@given(pairs=edge_lists)
def test_pagerank_property(spark, pairs):
    from cassovary_spark.operators import pagerank

    res = pagerank(edges_df(spark, pairs), max_iterations=5, tolerance=0.0)
    got = {r["id"]: r["pagerank"] for r in res.ranks.collect()}
    want, _err, _it = pagerank_oracle(pairs, max_iterations=5, tolerance=0.0)
    assert set(got) == set(want)
    for v, pr in want.items():
        assert got[v] == pytest.approx(pr, abs=1e-9)


@settings(**SETTINGS)
@given(pairs=edge_lists)
def test_bfs_property(spark, pairs):
    from cassovary_spark.operators import bfs

    seed = min(min(a, b) for a, b in pairs)
    got = {
        r["id"]: r["depth"] for r in bfs(edges_df(spark, pairs), [seed]).collect()
    }
    assert got == bfs_oracle(pairs, [seed])
