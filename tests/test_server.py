"""Query-serving entry point (reference cassovary-server analog):
walks and driver queries over HTTP against one long-lived session."""

from __future__ import annotations

import json
import urllib.request

from cassovary_spark.server import CassovarySparkServer
from tests.conftest import edges_df


def _get(port, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_server_health_walk_query(spark):
    edges = edges_df(
        spark, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (1, 3)]
    )
    srv = CassovarySparkServer(spark, edges, sf_dir="/root/testdata/sf0.001")
    port = srv.start(0)  # ephemeral port
    try:
        code, health = _get(port, "/health")
        assert code == 200 and health == {"status": "ok", "nodes": 4, "edges": 6}

        code, walk = _get(port, "/walk?start=0&topk=3")
        assert code == 200
        assert len(walk["top"]) == 3
        scores = [list(r.values())[-1] for r in walk["top"]]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)

        code, q = _get(port, "/query?name=ev_edges&limit=5")
        assert code == 200 and q["n"] == 5 and {"src", "dst"} <= set(q["rows"][0])

        code, bad = _get(port, "/query?name=nope")
        assert code == 200 and "unknown query" in bad["error"]

        code, _ = _get(port, "/nothere")
        assert code == 404
    finally:
        srv.shutdown()
