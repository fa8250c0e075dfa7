"""O(m) binomial ER generator: distribution, determinism, and graph-shape
invariants (reference: graph/TestGraph.scala:270-281 +
util/BinomialDistribution.scala)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_binomial_ppf_matches_binomial_moments():
    from cassovary_spark.sources.generators import _binomial_ppf

    rng = np.random.default_rng(1)
    u = rng.random(100_000)
    k = _binomial_ppf(u, np.full(100_000, 99), 0.2)
    assert abs(k.mean() - 19.8) < 0.15
    assert abs(k.var() - 15.84) < 0.5
    # normal-approx branch (lambda > 400)
    k2 = _binomial_ppf(rng.random(50_000), np.full(50_000, 10_000), 0.1)
    assert abs(k2.mean() - 1000) < 3
    assert abs(k2.var() - 900) < 30
    # degenerate p
    assert (_binomial_ppf(u[:10], np.full(10, 7), 0.0) == 0).all()
    assert (_binomial_ppf(u[:10], np.full(10, 7), 1.0) == 7).all()


def test_distinct_neighbors_invariants_and_batch_determinism():
    from cassovary_spark.sources.generators import _distinct_neighbors

    pdf = pd.DataFrame({"id": np.arange(100, dtype=np.int64)})
    e = _distinct_neighbors(pdf, 100, 0.2, 42, False)
    assert (e.src != e.dst).all()
    assert e.dst.between(0, 99).all()
    assert e.duplicated(["src", "dst"]).sum() == 0
    # splitting the id range over batches must not change any node's edges
    e1 = _distinct_neighbors(pdf.iloc[:37], 100, 0.2, 42, False)
    e2 = _distinct_neighbors(pdf.iloc[37:], 100, 0.2, 42, False)
    both = pd.concat([e1, e2]).sort_values(["src", "dst"]).reset_index(drop=True)
    assert both.equals(e.sort_values(["src", "dst"]).reset_index(drop=True))
    # undirected canonical form
    eu = _distinct_neighbors(pdf, 100, 0.1, 7, True)
    assert (eu.dst > eu.src).all()


def test_random_graph_spark_partition_independent(spark):
    from cassovary_spark.sources.generators import random_graph

    a = sorted(map(tuple, random_graph(spark, 200, 0.05, seed=9).collect()))
    b = sorted(
        map(tuple, random_graph(spark, 200, 0.05, seed=9).repartition(7).collect())
    )
    assert a == b and len(a) > 0
    n_mean = len(a) / 200
    assert abs(n_mean - 0.05 * 199) < 1.5


def test_random_undirected_graph_is_mutual(spark):
    from cassovary_spark.sources.generators import random_undirected_graph

    rows = {(r["src"], r["dst"]) for r in random_undirected_graph(spark, 80, 0.08, seed=3).collect()}
    assert rows
    assert all((d, s) in rows for (s, d) in rows)
    assert all(s != d for (s, d) in rows)


def test_random_graph_large_is_fast(spark):
    """10^6 nodes at mean degree 5 in O(m): must complete in well under a
    minute (the old O(n^2) crossJoin would need 10^12 candidate pairs)."""
    import time

    from cassovary_spark.sources.generators import random_graph

    t0 = time.time()
    m = random_graph(spark, 1_000_000, 5 / 1_000_000, seed=4).count()
    assert time.time() - t0 < 60
    assert abs(m / 1_000_000 - 5.0) < 0.1
