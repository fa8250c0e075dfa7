"""Shared Spark session + reference fixture graphs (graph/TestGraph.scala)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from cassovary_spark.session import get_spark


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_spark(app_name="cassovary_spark_tests", cores=8, shuffle_partitions=8)
    yield s


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


# --- reference fixture graphs (transcribed from graph/TestGraph.scala) ---

G2_MUTUAL = [(1, 2), (2, 1)]
G2_NONMUTUAL = [(1, 2)]

# TestGraph.scala:70-79 — node 2 dangling
G3_DANGLING = [(0, 1), (1, 2)]

# TestGraph.scala:81-85
G3 = [(10, 11), (10, 12), (11, 12), (12, 11)]

# TestGraph.scala:87-93
G5 = [(10, 11), (10, 12), (10, 13), (11, 12), (12, 11), (13, 14)]

# TestGraph.scala:95-113 — 3, 4, 7 dangling; node 0 absent (id-space hole)
DANGLING_G7 = [(1, 2), (2, 3), (2, 4), (5, 6), (6, 1), (6, 2), (6, 7)]

# TestGraph.scala:115-131 — the main algorithm fixture: 6 nodes, 11 edges
G6 = [
    (10, 11), (10, 12), (10, 13),
    (11, 12), (11, 14),
    (12, 14),
    (13, 12), (13, 14),
    (14, 15),
    (15, 10), (15, 11),
]

# our LPA/CC fixture: two K4 cliques bridged by 3-7 (FIXTURES.md §2)
TWO_CLIQUES_BRIDGED = (
    [(a, b) for a in range(4) for b in range(4) if a != b]
    + [(a, b) for a in range(4, 8) for b in range(4, 8) if a != b]
    + [(3, 7), (7, 3)]
)
TWO_CLIQUES = (
    [(a, b) for a in range(4) for b in range(4) if a != b]
    + [(a, b) for a in range(4, 8) for b in range(4, 8) if a != b]
)
