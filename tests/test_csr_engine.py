"""The pandas/Arrow CSR-block gather engine matches the join engine exactly."""

from __future__ import annotations

import pytest

from cassovary_spark.operators.pagerank import pagerank
from tests.conftest import DANGLING_G7, G6, edges_df


@pytest.mark.parametrize("fixture", [G6, DANGLING_G7])
def test_pandas_gather_matches_join(spark, fixture):
    e = edges_df(spark, fixture)
    a = pagerank(e, max_iterations=6)
    b = pagerank(e, max_iterations=6, gather_engine="pandas")
    ra = {r["id"]: r["pagerank"] for r in a.ranks.collect()}
    rb = {r["id"]: r["pagerank"] for r in b.ranks.collect()}
    assert ra.keys() == rb.keys()
    for k in ra:
        assert ra[k] == pytest.approx(rb[k], abs=1e-15)
    assert a.error == pytest.approx(b.error, abs=1e-15)


def test_pandas_gather_random_graph(spark):
    from cassovary_spark.sources.generators import random_graph

    e = random_graph(spark, 80, 0.06, seed=17)
    a = pagerank(e, max_iterations=4)
    b = pagerank(e, max_iterations=4, gather_engine="pandas")
    ra = {r["id"]: r["pagerank"] for r in a.ranks.collect()}
    rb = {r["id"]: r["pagerank"] for r in b.ranks.collect()}
    for k in ra:
        assert ra[k] == pytest.approx(rb[k], rel=1e-12)
