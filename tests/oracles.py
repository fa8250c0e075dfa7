"""Pure-Python/NumPy oracle implementations mirroring the reference loops.

These re-implement the reference recurrences directly from the cited Scala
sources (single-threaded, dict/array based) and serve as ground truth for the
distributed operators on arbitrary small graphs.
"""

from __future__ import annotations

from collections import Counter, defaultdict, deque


def pagerank_oracle(edges, damping=0.85, max_iterations=None, tolerance=1e-8):
    """Mirror of algorithms/linkanalysis/PageRank.scala iterate()."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    outdeg = Counter(u for u, _ in edges)
    dangling = [v for v in nodes if outdeg[v] == 0]
    pr = {v: 1.0 / n for v in nodes}
    damping_amount = (1.0 - damping) / n
    it, err = 0, 100.0 + tolerance
    while not (
        (max_iterations is not None and it >= max_iterations) or err <= tolerance
    ):
        dangle_sum = damping * sum(pr[v] for v in dangling) / n
        new = {v: damping_amount + dangle_sum for v in nodes}
        for u, v in edges:
            new[v] += damping * pr[u] / outdeg[u]
        err = sum(abs(pr[v] - new[v]) for v in nodes)
        pr, it = new, it + 1
    return pr, err, it


def hits_oracle(edges, max_iterations=100, tolerance=1e-8, normalize=True):
    """Mirror of algorithms/linkanalysis/Hits.scala iterate()/postRun()."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    hubs = {v: 1.0 / n for v in nodes}
    auth = {v: 0.0 for v in nodes}
    it, err = 0, 100.0 + tolerance

    def scale(m, by_max):
        d = max(m.values()) if by_max else sum(m.values())
        return m if d <= 0 else {k: v / d for k, v in m.items()}

    while not (
        (max_iterations is not None and it >= max_iterations) or err <= tolerance
    ):
        a = {v: 0.0 for v in nodes}
        for u, v in edges:
            a[v] += hubs[u]
        h = {v: 0.0 for v in nodes}
        for u, v in edges:
            h[u] += a[v]  # uses NEW authorities, like the reference
        h, a = scale(h, True), scale(a, True)
        err = sum(abs(hubs[v] - h[v]) for v in nodes)
        hubs, auth, it = h, a, it + 1
    if normalize:
        hubs, auth = scale(hubs, False), scale(auth, False)
    return hubs, auth, it, err


def undirected_adj(edges):
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    for v in nodes:
        adj.setdefault(v, set())
    return adj


def components_oracle(edges):
    """Min-id weakly-connected components via BFS."""
    adj = undirected_adj(edges)
    comp = {}
    for start in sorted(adj):
        if start in comp:
            continue
        group = []
        q, seen = deque([start]), {start}
        while q:
            x = q.popleft()
            group.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    q.append(y)
        m = min(group)
        for x in group:
            comp[x] = m
    return comp


def lpa_oracle(edges, max_iterations=20):
    """Synchronous LPA, mode-of-neighbor-labels, ties -> min label."""
    adj = undirected_adj(edges)
    labels = {v: v for v in adj}
    for _ in range(max_iterations):
        new = {}
        for v in adj:
            if not adj[v]:
                new[v] = labels[v]
                continue
            cnt = Counter(labels[u] for u in adj[v])
            best = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == best)
        if new == labels:
            break
        labels = new
    return labels


def triangles_oracle(edges):
    """Exact triangle count on the undirected view."""
    adj = undirected_adj(edges)
    count = 0
    for a in adj:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[b]:
                if c <= b:
                    continue
                if c in adj[a]:
                    count += 1
    return count


def wedges_oracle(edges):
    adj = undirected_adj(edges)
    return sum(len(s) * (len(s) - 1) // 2 for s in adj.values())


def bfs_oracle(edges, seeds, max_depth=None, max_degree=None):
    """Visit-once BFS depths (graph/Traverser.scala:426-450 semantics)."""
    out = defaultdict(list)
    for u, v in edges:
        out[u].append(v)
    depth = {s: 0 for s in seeds}
    frontier = list(seeds)
    d = 0
    while frontier and (max_depth is None or d < max_depth):
        nxt = []
        for u in frontier:
            if max_degree is not None and len(out[u]) > max_degree:
                continue
            for v in out[u]:
                if v not in depth:
                    depth[v] = d + 1
                    nxt.append(v)
        frontier = nxt
        d += 1
    return depth


def closeness_oracle(edges, normalize=True):
    """Mirror of algorithms/centrality/ClosenessCentrality.scala:23-39."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    vals = {}
    for s in nodes:
        depths = bfs_oracle(edges, [s])
        total = sum(depths.values())
        reach = len(depths)
        if total > 0 and n > 1:
            denom = (n - 1) / (reach - 1) if normalize else 1.0
            vals[s] = (reach - 1) / (denom * total)
        else:
            vals[s] = 0.0
    return vals


def jaccard_topk_oracle(edges, k):
    """Mirror of Similarity.getTopKAllSimilarPairs with JaccardSimilarity."""
    out = defaultdict(set)
    inn = defaultdict(set)
    nodes = set()
    for u, v in edges:
        out[u].add(v)
        inn[v].add(u)
        nodes |= {u, v}
    result = {}
    for u in sorted(nodes):
        cands = set()
        for w in out[u]:
            cands |= inn[w]
        cands.discard(u)
        scored = []
        for v in cands:
            common = len(out[u] & out[v])
            union = len(out[u] | out[v])
            score = 1.0 if union == 0 else common / union
            if score > 0:
                scored.append((v, score))
        scored.sort(key=lambda t: (-t[1], t[0]))
        result[u] = scored[:k]
    return result


def ppr_oracle(edges, seeds, reset_prob=0.15, max_iterations=30, tolerance=1e-8):
    """Power-iteration personalized PageRank matching traversals.personalized_pagerank."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = Counter(u for u, _ in edges)
    alpha, d = reset_prob, 1.0 - reset_prob
    seed_mass = {v: (1.0 / len(seeds) if v in set(seeds) else 0.0) for v in nodes}
    pr = dict(seed_mass)
    for _ in range(max_iterations):
        dangle = sum(pr[v] for v in nodes if outdeg[v] == 0)
        new = {v: (alpha + d * dangle) * seed_mass[v] for v in nodes}
        for u, v in edges:
            new[v] += d * pr[u] / outdeg[u]
        err = sum(abs(pr[v] - new[v]) for v in nodes)
        pr = new
        if err <= tolerance:
            break
    return pr
