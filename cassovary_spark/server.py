"""Query-serving entry point — the analog of the reference's
``cassovary-server`` (CassovaryServer.scala:32-67: an HTTP service that
answers each request by running a random walk / personalized reputation on
a graph and returning a summary).

Spark-first shape: ONE long-lived SparkSession serves every request (the
expensive part — JVM + executor warmup — is paid once, like the
reference's in-memory graph build), requests run the engine's public
operators, and responses are JSON. On a real deployment this process runs
on the cluster edge via ``spark-submit --py-files`` with the session
pointed at the cluster master; the HTTP layer is stdlib so the sandbox
needs no extra packages.

Endpoints:
- ``GET /health`` — node/edge counts of the served graph.
- ``GET /walk?start=0&steps=10000&reset=0.1&topk=10`` — personalized
  reputation from ``start`` (reference: walkOn's
  calculatePersonalizedReputation), top-k visited nodes.
- ``GET /query?name=<key>&limit=100`` — any ``__spark_entry__.queries()``
  entry over the server's sf_dir, first ``limit`` rows as JSON.

Requests are serialized through one lock: the session is shared and the
reference server likewise processes one walk per request thread; for
throughput, run N replicas behind a balancer (stateless — the graph is
re-readable parquet), not N threads into one driver.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


class CassovarySparkServer:
    def __init__(self, spark, edges, sf_dir: str | None = None):
        self.spark = spark
        self.edges = edges.persist()
        self.n_edges = self.edges.count()
        from cassovary_spark.graph import vertices_of

        self.n_nodes = vertices_of(self.edges).count()
        self.sf_dir = sf_dir
        self.lock = threading.Lock()
        self._httpd: ThreadingHTTPServer | None = None

    # ------------------------------------------------------------ handlers
    def health(self, _params) -> dict:
        return {"status": "ok", "nodes": self.n_nodes, "edges": self.n_edges}

    def walk(self, params) -> dict:
        from cassovary_spark.operators import personalized_pagerank

        start = int(params.get("start", ["0"])[0])
        reset = float(params.get("reset", ["0.1"])[0])
        topk = int(params.get("topk", ["10"])[0])
        iters = int(params.get("iters", ["30"])[0])
        res = personalized_pagerank(
            self.edges, seeds=[start], reset_prob=reset, max_iterations=iters
        )
        from pyspark.sql import functions as F

        top = res.orderBy(F.desc(res.columns[-1]), res.columns[0]).limit(topk)
        return {
            "start": start,
            "nodes": self.n_nodes,
            "edges": self.n_edges,
            "top": [row.asDict() for row in top.collect()],
        }

    def query(self, params) -> dict:
        import __spark_entry__ as entry

        name = params.get("name", [None])[0]
        limit = int(params.get("limit", ["100"])[0])
        qs = entry.queries()
        if name not in qs:
            return {"error": f"unknown query {name!r}", "known": sorted(qs)}
        if not self.sf_dir:
            return {"error": "server started without sf_dir"}
        df = qs[name](self.spark, self.sf_dir)
        rows = [row.asDict() for row in df.limit(limit).collect()]
        return {"name": name, "rows": rows, "n": len(rows)}

    # ------------------------------------------------------------ transport
    def serve(self, port: int = 8888):
        """Blockingly serve; use start()/shutdown() for embedded use."""
        self.start(port)
        try:
            self._httpd.serve_forever()
        finally:
            self.shutdown()

    def start(self, port: int = 8888) -> int:
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 — stdlib naming
                url = urlparse(self.path)
                route = {
                    "/health": outer.health,
                    "/walk": outer.walk,
                    "/query": outer.query,
                }.get(url.path)
                if route is None:
                    body, code = {"error": f"no route {url.path}"}, 404
                else:
                    try:
                        with outer.lock:
                            body, code = route(parse_qs(url.query)), 200
                    except Exception as exc:  # noqa: BLE001 — surface to client
                        body, code = {"error": str(exc)}, 500
                data = json.dumps(body).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def log_message(self, *a):  # quiet
                pass

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return self._httpd.server_address[1]

    def shutdown(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        self.edges.unpersist()


def main() -> None:
    """``python -m cassovary_spark.server [port] [sf_dir]`` — serve walks on
    a generated random graph (the reference server's demo setup:
    TestGraphs.generateRandomGraph(100, 0.1)) plus the driver query surface."""
    import sys

    from cassovary_spark.session import get_spark
    from cassovary_spark.sources import random_graph

    port = int(sys.argv[1]) if len(sys.argv) > 1 else 8888
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="cassovary_spark_server")
    edges = random_graph(spark, 100, 0.1, seed=42)
    srv = CassovarySparkServer(spark, edges, sf_dir=sf_dir)
    print(f"serving on 127.0.0.1:{port} (graph: {srv.n_nodes} nodes, {srv.n_edges} edges)")
    srv.serve(port)


if __name__ == "__main__":
    main()
