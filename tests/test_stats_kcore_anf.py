"""Round-5 operators: k-core peeling, degree assortativity, FM neighborhood
function, DSIR importance weights. Pure-Python oracles where the semantics
are simple enough to restate; local/distributed equality for k-core."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cassovary_spark.operators import (
    degree_assortativity,
    degree_distribution,
    k_core,
    neighborhood_function,
)
from tests.conftest import G5, edges_df


def _python_kcore(pairs, k):
    """Reference peel: dict-of-sets, repeat until stable."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {v for v in alive if len(adj[v] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {v: len(adj[v] & alive) for v in alive}


def test_kcore_matches_python_oracle_both_engines(spark):
    import random

    rng = random.Random(7)
    pairs = {(rng.randrange(60), rng.randrange(60)) for _ in range(400)}
    edges = edges_df(spark, sorted(pairs))
    want = _python_kcore(pairs, 3)
    for engine in ("local", "distributed"):
        got = {r.id: r.degree for r in k_core(edges, 3, engine=engine).collect()}
        assert got == want, engine


def test_kcore_empty_core(spark):
    # a path has no 2-core
    edges = edges_df(spark, [(1, 2), (2, 3), (3, 4)])
    for engine in ("local", "distributed"):
        assert k_core(edges, 2, engine=engine).count() == 0


def test_kcore_k1_is_nonisolated_vertices(spark):
    edges = edges_df(spark, G5)
    got = {r.id for r in k_core(edges, 1, engine="local").collect()}
    assert got == {10, 11, 12, 13, 14}


def test_assortativity_star_is_negative(spark):
    # star: hub degree n, leaves degree 1 — classic disassortative graph
    edges = edges_df(spark, [(0, i) for i in range(1, 8)])
    val = degree_assortativity(edges).first()[0]
    assert val is not None and val < 0


def test_assortativity_regular_graph_is_null(spark):
    # 4-cycle: all degrees equal -> zero variance -> undefined (NULL, not
    # DIVIDE_BY_ZERO under ANSI mode)
    edges = edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    assert degree_assortativity(edges).first()[0] is None


def test_degree_distribution(spark):
    edges = edges_df(spark, [(0, 1), (0, 2), (0, 3), (1, 2)])
    got = {r.degree: r.n_nodes for r in degree_distribution(edges, "out").collect()}
    assert got == {3: 1, 1: 1}


def test_anf_monotone_and_saturates_on_clique(spark):
    # complete graph: every vertex reaches all others in 1 hop, so the
    # sketch union is already maximal at t=1 and NF is constant after
    n = 8
    edges = edges_df(spark, [(a, b) for a in range(n) for b in range(n) if a != b])
    rows = neighborhood_function(edges, iterations=3, registers=4).collect()
    nf = {r.t: r.nf for r in rows}
    assert nf[1] == nf[2] == nf[3]
    # FM with 4 registers is coarse; just require the right order of magnitude
    assert 0.2 * n * n < nf[1] < 5 * n * n


def test_anf_grows_on_path(spark):
    edges = edges_df(spark, [(i, i + 1) for i in range(20)])
    rows = neighborhood_function(edges, iterations=3, registers=4).collect()
    nf = {r.t: r.nf for r in rows}
    assert nf[1] <= nf[2] <= nf[3]
    assert nf[3] > nf[1]  # a path keeps discovering new vertices each hop


def test_harmonic_sketch_saturates_on_clique(spark):
    # clique: every pair at distance 1, so deltas vanish after t=1 and
    # truncation depth stops mattering
    from cassovary_spark.operators import harmonic_centrality_sketch

    n = 6
    edges = edges_df(spark, [(a, b) for a in range(n) for b in range(n) if a != b])
    h1 = {r.id: r.harmonic for r in harmonic_centrality_sketch(edges, 1).collect()}
    h3 = {r.id: r.harmonic for r in harmonic_centrality_sketch(edges, 3).collect()}
    assert h1 == h3
    assert all(v >= 0 for v in h1.values())


def test_harmonic_sketch_path_center_beats_ends(spark):
    # on a path, interior vertices reach more vertices at short distance;
    # averaged over vertices the FM noise cancels enough to compare sums
    from cassovary_spark.operators import harmonic_centrality_sketch

    edges = edges_df(spark, [(i, i + 1) for i in range(30)])
    h = {r.id: r.harmonic for r in harmonic_centrality_sketch(edges, 3, registers=8).collect()}
    mid = sum(h[i] for i in range(10, 21)) / 11
    ends = (h[0] + h[30]) / 2
    assert mid > ends


def test_effective_diameter_clique_vs_path(spark):
    from cassovary_spark.operators import effective_diameter

    n = 8
    clique = edges_df(spark, [(a, b) for a in range(n) for b in range(n) if a != b])
    path = edges_df(spark, [(i, i + 1) for i in range(30)])
    d_clique = effective_diameter(clique, q=0.9, iterations=3).first()[0]
    d_path = effective_diameter(path, q=0.9, iterations=3).first()[0]
    assert 0.0 <= d_clique <= 1.5  # everything reached in one hop
    assert d_path > d_clique  # a path needs (much) more hops for 90%


def test_dsir_weights_prefer_target_like_docs(spark):
    target_words = "alpha beta gamma delta"
    other_words = "omega psi chi phi"
    corpus = spark.createDataFrame(
        [(i, target_words if i % 2 == 0 else other_words) for i in range(40)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100 + i, target_words) for i in range(10)], "doc_id long, text string"
    )
    from cassovary_spark.functions import dsir_weights

    w = {r.doc_id: r.log_weight for r in dsir_weights(corpus, target).collect()}
    assert len(w) == 40
    tgt_like = [w[i] for i in range(0, 40, 2)]
    other = [w[i] for i in range(1, 40, 2)]
    assert min(tgt_like) > max(other)
    assert all(map(math.isfinite, w.values()))


def test_dsir_select_is_deterministic_and_biased_to_target(spark):
    from cassovary_spark.functions import dsir_select

    target_words = "alpha beta gamma delta"
    other_words = "omega psi chi phi"
    corpus = spark.createDataFrame(
        [(i, target_words if i % 2 == 0 else other_words) for i in range(60)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100, target_words)], "doc_id long, text string"
    )
    a = [r.doc_id for r in dsir_select(corpus, target, k=20).collect()]
    b = [r.doc_id for r in dsir_select(corpus, target, k=20).collect()]
    assert a == b  # md5-seeded Gumbel draws: fully deterministic
    # weight gap is large vs Gumbel noise, so the selection should be
    # dominated by target-like (even) docs
    assert sum(1 for d in a if d % 2 == 0) >= 15
    # different seed -> different draws (same determinism contract)
    c = [r.doc_id for r in dsir_select(corpus, target, k=20, seed="other").collect()]
    assert a != c or len(set(a)) == 20


def test_dsir_zero_gram_docs_get_zero(spark):
    corpus = spark.createDataFrame(
        [(0, "   "), (1, None), (2, "hello world")], "doc_id long, text string"
    )
    target = spark.createDataFrame([(9, "hello")], "doc_id long, text string")
    from cassovary_spark.functions import dsir_weights

    rows = {r.doc_id: (r.n_grams, r.log_weight) for r in dsir_weights(corpus, target).collect()}
    assert rows[0] == (0, 0.0)
    assert rows[1] == (0, 0.0)
    assert rows[2][0] == 3  # hello, world, "hello world"
