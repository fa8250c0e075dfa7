"""Tourists (event-log collectors) + random_walk_events + dfs_times vs
pure-Python oracles mirroring graph/tourist/*.scala and Traverser.scala DFS."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cassovary_spark.operators import (
    dfs_times,
    info_keeper,
    paths_counter,
    prev_nbr_counter,
    random_walk_events,
    visits_counter,
)
from tests.conftest import G6, edges_df


def test_walk_events_shape_and_consistency(spark):
    e = edges_df(spark, G6)
    ev = random_walk_events(
        e, start_nodes=[10], num_steps=5, reset_prob=0.2, num_walkers=7,
        seed=3, track_paths=True,
    )
    rows = ev.collect()
    # one event per walker per step (including step 0)
    assert len(rows) == 7 * 6
    by_walker: dict[int, dict[int, object]] = {}
    for r in rows:
        by_walker.setdefault(r["walker"], {})[r["step"]] = r
    adj: dict[int, set[int]] = {}
    for s, d in G6:
        adj.setdefault(s, set()).add(d)
    for w, steps in by_walker.items():
        assert steps[0]["id"] == 10 and steps[0]["prev"] is None
        assert list(steps[0]["path"]) == [10]
        for k in range(1, 6):
            cur, prev = steps[k]["id"], steps[k]["prev"]
            if prev is None:  # reset (or dangling) -> home
                assert cur == 10
                assert list(steps[k]["path"]) == [10]
            else:
                assert prev == steps[k - 1]["id"]
                assert cur in adj.get(prev, set())
                assert list(steps[k]["path"]) == list(steps[k - 1]["path"]) + [cur]


def test_tourist_aggregations_match_oracle(spark):
    ev = spark.createDataFrame(
        [
            # walker, step, id, prev, path
            (0, 0, 1, None, [1]),
            (0, 1, 2, 1, [1, 2]),
            (0, 2, 3, 2, [1, 2, 3]),
            (1, 0, 1, None, [1]),
            (1, 1, 2, 1, [1, 2]),
            (1, 2, 2, 2, [1, 2, 2]),
            (2, 0, 2, None, [2]),
            (2, 1, 3, 2, [2, 3]),
            (2, 2, 1, 3, [2, 3, 1]),
        ],
        "walker long, step long, id long, prev long, path array<long>",
    )
    v = {r["id"]: r["visits"] for r in visits_counter(ev).collect()}
    assert v == {1: 3, 2: 4, 3: 2}
    # ordering: count desc, id asc
    ordered = [r["id"] for r in visits_counter(ev).collect()]
    assert ordered == [2, 1, 3]

    pn = {r["id"]: list(r["prev_nbrs"]) for r in prev_nbr_counter(ev, k=1).collect()}
    assert pn == {2: [1], 3: [2], 1: [3]}

    pc = {r["id"]: [list(p) for p in r["paths"]] for r in paths_counter(ev, k=2).collect()}
    assert pc[2] == [[1, 2], [1, 2, 2]] or pc[2] == [[1, 2], [2]]
    # exactly: counts are [1,2]x2, [1,2,2]x1, [2]x1 -> top2 = [1,2] then lexicographic min of ties
    assert pc[2][0] == [1, 2]

    first = {r["id"]: r["step"] for r in info_keeper(ev, "step", first=True).collect()}
    assert first == {1: 0, 2: 0, 3: 1}
    last = {r["id"]: r["step"] for r in info_keeper(ev, "step", first=False).collect()}
    assert last == {1: 2, 2: 2, 3: 2}


def dfs_oracle(edges, seeds, max_depth=None):
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    for v in adj.values():
        v.sort()
    disc, fin = {}, {}
    clock = 0

    def visit(u, depth):
        nonlocal clock
        disc[u] = clock
        clock += 1
        if max_depth is None or depth < max_depth:
            for nbr in adj.get(u, []):
                if nbr not in disc:
                    visit(nbr, depth + 1)
        fin[u] = clock
        clock += 1

    for s in seeds:
        if s not in disc:
            visit(s, 0)
    return disc, fin


@pytest.mark.parametrize("max_depth", [None, 2])
def test_dfs_times_matches_oracle(spark, max_depth):
    random.seed(5)
    edges = list({(random.randrange(12), random.randrange(12)) for _ in range(40)})
    edges = [(s, d) for s, d in edges if s != d]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = [0, 5]
    got = {r["id"]: (r["discovery"], r["finish"]) for r in dfs_times(e, seeds, max_depth).collect()}
    disc, fin = dfs_oracle(edges, seeds, max_depth)
    assert got == {k: (disc[k], fin[k]) for k in disc}


def test_walk_events_feed_visits_counter_equals_random_walk_visits(spark):
    from cassovary_spark.operators import random_walk_visits

    e = edges_df(spark, G6)
    kw = dict(start_nodes=[10, 11], num_steps=4, reset_prob=0.3, num_walkers=9, seed=11)
    ev = random_walk_events(e, **kw)
    v1 = {r["id"]: r["visits"] for r in visits_counter(ev).collect()}
    v2 = {r["id"]: r["visits"] for r in random_walk_visits(e, **kw).collect()}
    assert v1 == v2
