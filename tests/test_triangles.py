"""Exact triangle counting (TriangleCountSpec.scala bands, exact assertions)."""

from __future__ import annotations

import pytest

from cassovary_spark.operators.triangles import (
    transitivity_stats,
    triangle_count,
    wedge_count,
)
from tests.conftest import G6, TWO_CLIQUES, TWO_CLIQUES_BRIDGED, edges_df
from tests.oracles import triangles_oracle, wedges_oracle


def test_complete_graph_exact(spark):
    # K_n has n(n-1)(n-2)/6 triangles, transitivity 1.0
    # (TriangleCountSpec.scala:75-88 uses n=100 -> 161700)
    from cassovary_spark.sources.generators import complete_graph

    n = 30
    e = complete_graph(spark, n)
    stats = transitivity_stats(e)
    assert stats["triangles"] == n * (n - 1) * (n - 2) // 6
    assert stats["transitivity"] == pytest.approx(1.0)


def test_two_cliques(spark):
    # two K4s: 2 * 4 triangles
    assert triangle_count(edges_df(spark, TWO_CLIQUES)) == 8
    assert triangle_count(edges_df(spark, TWO_CLIQUES_BRIDGED)) == 8


def test_g6_matches_oracle(spark):
    e = edges_df(spark, G6)
    assert triangle_count(e) == triangles_oracle(G6)
    assert wedge_count(e) == wedges_oracle(G6)


def test_sparse_er_near_zero(spark):
    # TriangleCountSpec.scala:48-57: n=1000, p=2/n -> ~0 triangles; we assert
    # exact equality with the oracle on the generated instance
    from cassovary_spark.sources.generators import random_undirected_graph

    e = random_undirected_graph(spark, 300, 2 / 300, seed=42)
    pairs = [(r["src"], r["dst"]) for r in e.collect()]
    got = triangle_count(e)
    assert got == triangles_oracle(pairs)
    assert got < 10


def test_dense_er_matches_oracle_and_band(spark):
    # TriangleCountSpec.scala:59-73: E[tri] = p^3 * C(n,3), transitivity ~ p
    from cassovary_spark.sources.generators import random_undirected_graph

    n, p = 60, 0.3
    e = random_undirected_graph(spark, n, p, seed=42)
    pairs = [(r["src"], r["dst"]) for r in e.collect()]
    stats = transitivity_stats(e)
    assert stats["triangles"] == triangles_oracle(pairs)
    assert stats["wedges"] == wedges_oracle(pairs)
    expected = p**3 * n * (n - 1) * (n - 2) / 6
    assert stats["triangles"] == pytest.approx(expected, rel=0.5)
    assert stats["transitivity"] == pytest.approx(p, rel=0.35)


def test_directed_input_is_undirected_view(spark):
    # a one-directional triangle still counts once
    assert triangle_count(edges_df(spark, [(1, 2), (2, 3), (3, 1)])) == 1
    # duplicate + reciprocal edges don't double count
    assert (
        triangle_count(
            edges_df(spark, [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 2)])
        )
        == 1
    )


def test_triangle_estimator_unbiased_and_deterministic(spark):
    from cassovary_spark.operators.triangles import triangle_count_estimate
    from cassovary_spark.sources.generators import complete_graph

    e = complete_graph(spark, 12)  # 220 triangles exactly
    a = triangle_count_estimate(e, sample_prob=0.6, seed=7)
    b = triangle_count_estimate(e, sample_prob=0.6, seed=7)
    # deterministic hash coin: identical across runs (and parallelism levels)
    assert a == b
    assert a["wedges"] == 12 * 11 * 10 // 2
    assert a["triangles_estimate"] == pytest.approx(220, rel=0.6)
    # full-probability sampling degenerates to the exact count
    full = triangle_count_estimate(e, sample_prob=1.0, seed=7)
    assert full["triangles_sampled"] == 220


def test_wedge_volume_gate_falls_back_to_distributed(spark, monkeypatch):
    """Auto routing re-checks oriented wedge volume before the in-memory
    twin (ADVICE r2: a dense 1M-edge graph is edge-count-small but wedge-
    volume-huge); when the gate trips, the distributed plan still answers."""
    import cassovary_spark.operators.local_engine as LE
    from cassovary_spark.operators.triangles import triangle_count

    # K6: oriented wedge volume = sum of squared oriented out-degrees
    k6 = edges_df(
        spark, [(a, b) for a in range(6) for b in range(6) if a < b]
    )
    import numpy as np

    ids, si, di = LE.edges_to_numpy(k6)
    assert LE.oriented_wedge_volume(ids, si, di) == sum(k * k for k in range(6))

    monkeypatch.setattr(LE, "oriented_wedge_volume", lambda *a: 10**12)
    assert triangle_count(k6) == 20  # C(6,3), via the distributed fallback
    # explicit local bypasses the gate (documented caller override)
    assert triangle_count(k6, engine="local") == 20
