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


# distributed-pinned variants: the single-spark.sql() superstep builds
# (components.py/labelprop.py) are string-assembled plans — pin them to the
# same oracles on adversarial shapes (duplicate edges, self-loops, cycles)
# instead of relying only on the fixed-graph local==distributed equality
DIST_SETTINGS = dict(SETTINGS, max_examples=3)


@settings(**DIST_SETTINGS)
@given(pairs=edge_lists)
def test_components_distributed_property(spark, pairs):
    from cassovary_spark.operators import connected_components

    got = {
        r["id"]: r["component"]
        for r in connected_components(
            edges_df(spark, pairs), engine="distributed"
        ).collect()
    }
    assert got == components_oracle(pairs)


@settings(**DIST_SETTINGS)
@given(pairs=edge_lists)
def test_lpa_distributed_property(spark, pairs):
    from cassovary_spark.operators import label_propagation

    got = {
        r["id"]: r["label"]
        for r in label_propagation(
            edges_df(spark, pairs), max_iterations=6, engine="distributed"
        ).collect()
    }
    assert got == lpa_oracle(pairs, max_iterations=6)


@settings(**SETTINGS)
@given(pairs=edge_lists)
def test_bfs_property(spark, pairs):
    from cassovary_spark.operators import bfs

    seed = min(min(a, b) for a, b in pairs)
    got = {
        r["id"]: r["depth"] for r in bfs(edges_df(spark, pairs), [seed]).collect()
    }
    assert got == bfs_oracle(pairs, [seed])


# --- pure-Python property (no Spark): the identity behind the ev_dfs DuckDB
# oracle (__spark_entry__._dfs_sql). With sorted-neighbor expansion, a node's
# DFS tree path is the lexicographically smallest simple path from the seed
# (prefix < extension), and
#   disc(v) = 2*preIdx(v) - depth(v);  fin(v) = disc(v) + 2*size(v) - 1.
def _py_dfs_times(adj, seed):
    disc, fin, clock = {}, {}, 0
    disc[seed] = clock
    clock += 1
    stack = [(seed, iter(sorted(adj.get(seed, []))))]
    while stack:
        node, it = stack[-1]
        for nbr in it:
            if nbr not in disc:
                disc[nbr] = clock
                clock += 1
                stack.append((nbr, iter(sorted(adj.get(nbr, [])))))
                break
        else:
            fin[node] = clock
            clock += 1
            stack.pop()
    return disc, fin


@settings(max_examples=60, deadline=None, print_blob=True)
@given(pairs=edge_lists)
def test_dfs_oracle_identity_property(pairs):
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        if a != b and b not in adj.setdefault(a, []):
            adj[a].append(b)
    seed = pairs[0][0]
    disc, fin = _py_dfs_times(adj, seed)

    # min-lex simple paths by exhaustive enumeration (graphs are <= 9 nodes)
    best = {}
    todo = [(seed,)]
    while todo:
        p = todo.pop()
        v = p[-1]
        if v not in best or p < best[v]:
            best[v] = p
        for n in sorted(adj.get(v, [])):
            if n not in p:
                todo.append(p + (n,))
    assert set(best) == set(disc)
    order = sorted(best, key=lambda v: best[v])
    pre = {v: i for i, v in enumerate(order)}
    for v in best:
        depth = len(best[v]) - 1
        size = sum(1 for u in best if best[u][: len(best[v])] == best[v])
        d = 2 * pre[v] - depth
        assert disc[v] == d, (adj, v)
        assert fin[v] == d + 2 * size - 1, (adj, v)
