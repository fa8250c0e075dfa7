"""Bipartite iterative link analysis vs a pure-Python oracle mirroring
graph/bipartite/IterativeLinkAnalyzer.scala."""

from __future__ import annotations

import pytest


def bila_oracle(edges, left_init, num_iterations, a_left, a_right, k):
    """Mirror of IterativeLinkAnalyzer.analyze (see reference :36-183)."""
    from collections import defaultdict

    out = defaultdict(list)
    for l, r in edges:
        if l in left_init:
            out[l].append(r)
    lw = {l: w for l, w in left_init.items()}
    linit = dict(left_init)
    ldeg = {l: len(out[l]) for l in left_init}
    rdeg = defaultdict(int)
    for l in left_init:
        for r in out[l]:
            rdeg[r] += 1
    rw = {r: 0.0 for r in rdeg}
    l_contrib, r_contrib = {}, {}

    for it in range(1, num_iterations + 1):
        last = it >= num_iterations - 1
        if it % 2 == 1:
            new_rw = {r: 0.0 for r in rw}
            flows = defaultdict(list)
            for l in left_init:
                for r in out[l]:
                    new_rw[r] += (lw[l] / ldeg[l]) * (1 - a_right)
                    flows[r].append((lw[l], l))
            rw = new_rw
            if last:
                r_contrib = {
                    r: [x for _, x in sorted(v, key=lambda t: (-t[0], t[1]))[:k]]
                    for r, v in flows.items()
                }
        else:
            new_lw = {l: a_left * linit[l] for l in lw}
            flows = defaultdict(list)
            for l in left_init:
                for r in out[l]:
                    new_lw[l] += (rw[r] / rdeg[r]) * (1 - a_left)
                    flows[l].append((rw[r], r))
            lw = new_lw
            if last:
                l_contrib = {
                    l: [x for _, x in sorted(v, key=lambda t: (-t[0], t[1]))[:k]]
                    for l, v in flows.items()
                }
    return lw, rw, l_contrib, r_contrib


EDGES = [
    (1, 101), (1, 102),
    (2, 101), (2, 103),
    (3, 102), (3, 103), (3, 104),
    (4, 104),
]
INIT = {1: 1.0, 2: 2.0, 3: 0.5, 4: 1.5}


@pytest.mark.parametrize("iters", [1, 2, 3, 4])
@pytest.mark.parametrize("engine", ["local", "distributed"])
def test_bila_matches_oracle(spark, iters, engine):
    from cassovary_spark.operators import bipartite_link_analysis

    e = spark.createDataFrame(EDGES, "src long, dst long")
    lw = spark.createDataFrame(list(INIT.items()), "id long, weight double")
    res = bipartite_link_analysis(
        e, lw, num_iterations=iters, reset_prob_left=0.3, reset_prob_right=0.1,
        num_top_contributors=2, engine=engine,
    )
    olw, orw, olc, orc = bila_oracle(EDGES, INIT, iters, 0.3, 0.1, 2)

    got_l = {r["id"]: (r["weight"], list(r["contributors"])) for r in res.left.collect()}
    got_r = {r["id"]: (r["weight"], list(r["contributors"])) for r in res.right.collect()}
    assert set(got_l) == set(olw) and set(got_r) == set(orw)
    for i, w in olw.items():
        assert got_l[i][0] == pytest.approx(w, abs=1e-12)
        assert got_l[i][1] == olc.get(i, [])
    for i, w in orw.items():
        assert got_r[i][0] == pytest.approx(w, abs=1e-12)
        assert got_r[i][1] == orc.get(i, [])


def test_bila_restricts_to_supplied_left(spark):
    from cassovary_spark.operators import bipartite_link_analysis

    e = spark.createDataFrame(EDGES + [(99, 101)], "src long, dst long")
    lw = spark.createDataFrame(list(INIT.items()), "id long, weight double")
    res = bipartite_link_analysis(e, lw, num_iterations=2)
    ids = {r["id"] for r in res.left.collect()}
    assert 99 not in ids


def test_bila_local_matches_distributed_random(spark):
    """Adaptive-engine equality on a random bipartite graph: same weights to
    float tolerance, identical contributor lists under rounding=6 (the
    cross-engine-stable ranking the entry queries use)."""
    from cassovary_spark.operators import bipartite_link_analysis
    from cassovary_spark.sources.generators import random_graph

    g = random_graph(spark, 200, 0.04, seed=7)
    from pyspark.sql import functions as F

    # left ids 0..199 as-is, right ids offset into a distinct space
    e = g.select("src", (F.col("dst") + 1000).alias("dst"))
    lw = (
        e.select(F.col("src").alias("id")).distinct()
        # non-uniform init so contributor ranking is exercised
        .withColumn("weight", (F.col("id") % 5 + 1).cast("double"))
    )
    kw = dict(num_iterations=4, reset_prob_left=0.25, reset_prob_right=0.15,
              num_top_contributors=3, contributor_weight_rounding=6)
    loc = bipartite_link_analysis(e, lw, engine="local", **kw)
    dist = bipartite_link_analysis(e, lw, engine="distributed", **kw)

    def to_map(df):
        return {
            r["id"]: (r["weight"], list(r["contributors"]))
            for r in df.collect()
        }

    for side in ("left", "right"):
        lm, dm = to_map(getattr(loc, side)), to_map(getattr(dist, side))
        assert lm.keys() == dm.keys(), side
        for k in lm:
            assert lm[k][0] == pytest.approx(dm[k][0], abs=1e-9), (side, k)
            assert lm[k][1] == dm[k][1], (side, k)


def test_bila_empty_edges_local(spark):
    from cassovary_spark.operators import bipartite_link_analysis

    e = spark.createDataFrame([], "src long, dst long")
    lw = spark.createDataFrame([(1, 2.0)], "id long, weight double")
    # reset_prob_left keeps a share of init on the even pass; with no edges
    # the left weight is exactly reset_left * init (same as distributed)
    res = bipartite_link_analysis(
        e, lw, num_iterations=2, reset_prob_left=0.3, engine="local"
    )
    rows = res.left.collect()
    assert [(r["id"], r["weight"], list(r["contributors"])) for r in rows] == [
        (1, pytest.approx(0.6), [])
    ]
    assert res.right.count() == 0
