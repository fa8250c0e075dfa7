"""Deterministic graph generators (reference: graph/TestGraph.scala).

All generators are hash-based (xxhash64 of (src, dst, seed)) rather than
sequential-RNG-based, so they are reproducible under any partitioning and
generate distributively from ``spark.range`` — no driver-side edge lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HASH_SCALE = 2**63 - 1

# ---------------------------------------------------------------------------
# Vectorized deterministic sampling primitives (numpy, used inside mapInPandas)
# ---------------------------------------------------------------------------


def _splitmix64(x):
    """Counter-based 64-bit mixer (public splitmix64 constants); input/output
    uint64 numpy arrays. Stateless => reproducible under any partitioning."""
    import numpy as np

    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _hash_uniform(node, ctr, seed):
    """Deterministic U[0,1) from (node, counter, seed) — the vectorized analog
    of the reference's per-node RNG draw (util/BinomialDistribution.scala uses
    a java.util.Random stream; we use a counter-based hash so any partition
    can draw any node's stream independently)."""
    import numpy as np

    h = _splitmix64(node.astype(np.uint64) ^ np.uint64((seed * 0x9E3779B97F4A7C15) % 2**64))
    h = _splitmix64(h ^ ctr.astype(np.uint64))
    return (h >> np.uint64(11)).astype(np.float64) * (2.0**-53)


def _probit(u):
    """Acklam's rational approximation to the standard-normal inverse CDF
    (public-domain algorithm, |rel err| < 1.15e-9). scipy-free."""
    import numpy as np

    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    u = np.clip(u, 1e-300, 1 - 1e-16)
    out = np.empty_like(u)
    lo, hi = 0.02425, 1 - 0.02425
    m_lo, m_hi = u < lo, u > hi
    m_mid = ~(m_lo | m_hi)
    if m_lo.any():
        q = np.sqrt(-2 * np.log(u[m_lo]))
        out[m_lo] = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    if m_hi.any():
        q = np.sqrt(-2 * np.log(1 - u[m_hi]))
        out[m_hi] = -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    if m_mid.any():
        q = u[m_mid] - 0.5
        r = q * q
        out[m_mid] = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
            ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
        )
    return out


def _binomial_ppf(u, nn, p):
    """Exact vectorized Binomial(nn, p) inverse CDF via the pmf recurrence
    pmf[k+1] = pmf[k] * (nn-k)/(k+1) * p/(1-p), accumulating until cdf >= u.
    Rows whose pmf[0] = (1-p)^nn underflows (lambda = nn*p > ~400) use the
    normal approximation with continuity correction (skewness negligible
    there). Reference analog: util/BinomialDistribution.scala builds the same
    cumulative table; here it is per-row vectorized with varying nn."""
    import numpy as np

    u = np.asarray(u, dtype=np.float64)
    nn = np.asarray(nn, dtype=np.int64)
    k = np.zeros(len(u), dtype=np.int64)
    if p <= 0.0 or len(u) == 0:
        return k
    if p >= 1.0:
        return nn.copy()
    lam = nn * p
    exact = lam <= 400.0
    if (~exact).any():
        sig = np.sqrt(lam[~exact] * (1 - p))
        kk = np.rint(lam[~exact] + sig * _probit(u[~exact])).astype(np.int64)
        k[~exact] = np.clip(kk, 0, nn[~exact])
    if exact.any():
        ue, ne = u[exact], nn[exact]
        ratio = p / (1.0 - p)
        pmf = np.exp(ne * np.log1p(-p))
        cdf = pmf.copy()
        ke = np.zeros(len(ue), dtype=np.int64)
        done = cdf >= ue
        j = 0
        jmax = int(np.max(lam[exact]) + 12 * np.sqrt(np.max(lam[exact]) + 1) + 25)
        while not done.all() and j < jmax:
            pmf = pmf * ((ne - j) / (j + 1.0)) * ratio
            cdf = cdf + pmf
            newly = ~done & (cdf >= ue)
            ke[newly] = j + 1
            done |= newly
            j += 1
        ke[~done] = np.minimum(jmax, ne[~done])  # numerical tail clamp
        k[exact] = np.minimum(ke, ne)
    return k


def _distinct_neighbors(pdf, n, p_edge, seed, undirected):
    """First-k-distinct neighbor sampling for one Arrow batch of node ids.

    Per node u: k ~ Binomial(nn, p) where nn = n-1 (directed: any node but u)
    or nn = n-1-u (undirected: higher-numbered nodes only), then the node's
    counter-hash stream is consumed in order, keeping the first k DISTINCT
    destinations — the exact distribution of G(n, p) adjacency (size is
    binomial; conditioned on size, the set is uniform), matching the
    reference's sample-then-fill loop (graph/TestGraph.scala:270-281) without
    its sequential RNG. All numpy/pandas vectorized; the draw stream is keyed
    (node, counter, seed) so results are independent of batching."""
    import numpy as np
    import pandas as pd

    ids = pdf["id"].to_numpy(np.int64)
    nn = np.full(len(ids), n - 1, dtype=np.int64) if not undirected else (n - 1 - ids)
    u0 = _hash_uniform(ids, np.full(len(ids), 2**62, dtype=np.uint64), seed)
    k = _binomial_ppf(u0, nn, p_edge)
    alive = k > 0
    ids, nn, k = ids[alive], nn[alive], k[alive]
    if len(ids) == 0:
        return pd.DataFrame({"src": np.array([], np.int64), "dst": np.array([], np.int64)})

    # accepted pool, kept sorted by (pos, ctr); (pos << ) dedupe key needs
    # pos * n + dst < 2^63 — pos is bounded by the Arrow batch size (default
    # 10k rows), so this holds for n up to ~9e14 vertices
    pool_pos = np.array([], dtype=np.int64)
    pool_ctr = np.array([], dtype=np.int64)
    pool_dst = np.array([], dtype=np.int64)
    ctr_start = np.zeros(len(ids), dtype=np.int64)
    have = np.zeros(len(ids), dtype=np.int64)
    while True:
        need = k - have
        todo = need > 0
        if not todo.any():
            break
        # per-node draw count: need scaled by the expected collision rate
        # (nn/(nn-have)) plus a constant buffer — 2-3 rounds typical
        idx = np.nonzero(todo)[0]
        scale = nn[idx] / np.maximum(1, nn[idx] - have[idx])
        draws = (need[idx] * np.ceil(scale * 1.3).astype(np.int64)) + 8
        node_pos = np.repeat(idx, draws)
        # grouped arange without a python loop: global index minus each
        # slot's segment start, plus that node's counter offset
        seg_start = np.cumsum(draws) - draws
        ctr = (np.arange(int(draws.sum()), dtype=np.int64)
               - np.repeat(seg_start, draws) + np.repeat(ctr_start[idx], draws))
        ctr_start[idx] += draws
        raw = _hash_uniform(ids[node_pos], ctr.astype(np.uint64), seed ^ 0x5DEECE66D)
        dst_raw = np.minimum((raw * nn[node_pos]).astype(np.int64), nn[node_pos] - 1)
        if undirected:
            dst = ids[node_pos] + 1 + dst_raw
        else:
            dst = dst_raw + (dst_raw >= ids[node_pos])  # skip self
        # merge pool + fresh draws into global (pos, ctr) order: both inputs
        # are pos-grouped and ctr-ascending, and pool counters precede fresh
        # ones per node, so a stable sort on pos alone restores full order
        pos_all = np.concatenate([pool_pos, node_pos])
        ctr_all = np.concatenate([pool_ctr, ctr])
        dst_all = np.concatenate([pool_dst, dst])
        order = np.argsort(pos_all, kind="stable")
        pos_all, ctr_all, dst_all = pos_all[order], ctr_all[order], dst_all[order]
        # first occurrence per (pos, dst) = lowest index = earliest counter
        key = pos_all * np.int64(n) + dst_all
        _, first_idx = np.unique(key, return_index=True)
        first_idx.sort()
        pos_u, ctr_u, dst_u = pos_all[first_idx], ctr_all[first_idx], dst_all[first_idx]
        # rank within each pos segment (array is pos-grouped, ctr-ascending)
        is_new_seg = np.ones(len(pos_u), dtype=bool)
        is_new_seg[1:] = pos_u[1:] != pos_u[:-1]
        seg_starts = np.nonzero(is_new_seg)[0]
        seg_id = np.cumsum(is_new_seg) - 1
        rank = np.arange(len(pos_u), dtype=np.int64) - seg_starts[seg_id]
        keep = rank < k[pos_u]
        pool_pos, pool_ctr, pool_dst = pos_u[keep], ctr_u[keep], dst_u[keep]
        have = np.bincount(pool_pos, minlength=len(ids)).astype(np.int64)
    return pd.DataFrame({"src": ids[pool_pos], "dst": pool_dst})


def complete_graph(spark: SparkSession, n: int) -> DataFrame:
    """K_n with both directions (TestGraph.scala:238-245)."""
    ids = spark.range(n)
    a = ids.select(F.col("id").alias("src"))
    b = ids.select(F.col("id").alias("dst"))
    return a.crossJoin(b).filter(F.col("src") != F.col("dst"))


def _er_edges(
    spark: SparkSession, n: int, p_edge: float, seed: int, undirected: bool
) -> DataFrame:
    """O(m) distributed ER generation: per-node binomial degree + first-k-
    distinct neighbor sampling inside one ``mapInPandas`` pass over
    ``spark.range(n)``. Total work O(n + m) — a 10^7-node / 10^8-edge graph
    generates in seconds, vs the O(n^2) candidate crossJoin of the pairwise
    method. Coupon-collector caveat: per-node rejection makes dense regimes
    (p close to 1) draw ~nn·ln(nn) candidates; for those use
    ``method='pairwise'`` or ``complete_graph`` (m ~ n^2 anyway)."""
    ids = spark.range(n).repartition(
        max(spark.sparkContext.defaultParallelism, n // 2_000_000 + 1)
    )

    def gen(batches):
        for pdf in batches:
            yield _distinct_neighbors(pdf, n, p_edge, seed, undirected)

    return ids.mapInPandas(gen, "src long, dst long")


def random_graph(
    spark: SparkSession, n: int, p_edge: float, seed: int = 42,
    method: str = "binomial",
) -> DataFrame:
    """Directed Erdős–Rényi G(n, p) (TestGraph.scala:270-281 +
    util/BinomialDistribution.scala analog).

    ``method='binomial'`` (default): per-node Binomial(n-1, p) out-degree +
    uniform distinct neighbors — the exact G(n,p) distribution (out-degree is
    binomial; conditioned on it, the neighbor set is uniform) in O(m) work,
    mirroring the reference's sample-degree-then-fill construction.

    ``method='pairwise'``: edge (u, v) present iff hash(u, v, seed) < p —
    per-pair Bernoulli over the O(n^2) candidate crossJoin; exact but only
    viable at test scales."""
    if method == "binomial":
        return _er_edges(spark, n, p_edge, seed, undirected=False)
    ids = spark.range(n)
    pairs = ids.select(F.col("id").alias("src")).crossJoin(
        ids.select(F.col("id").alias("dst"))
    ).filter(F.col("src") != F.col("dst"))
    u = (F.abs(F.xxhash64("src", "dst", F.lit(seed))) / F.lit(float(HASH_SCALE)))
    return pairs.filter(u < F.lit(float(p_edge)))


def random_undirected_graph(
    spark: SparkSession, n: int, p_edge: float, seed: int = 42,
    method: str = "binomial",
) -> DataFrame:
    """Undirected ER as a mutual (bidirected) edge set
    (TestGraph.scala:289-323 analog).

    ``method='binomial'`` samples, per node u, Binomial(n-1-u, p) forward
    neighbors among higher-numbered nodes (exact undirected G(n,p)) in O(m),
    then mirrors; ``method='pairwise'`` is the O(n^2) per-pair form."""
    if method == "binomial":
        canon = _er_edges(spark, n, p_edge, seed, undirected=True)
    else:
        ids = spark.range(n)
        pairs = ids.select(F.col("id").alias("src")).crossJoin(
            ids.select(F.col("id").alias("dst"))
        ).filter(F.col("src") < F.col("dst"))
        u = (F.abs(F.xxhash64("src", "dst", F.lit(seed))) / F.lit(float(HASH_SCALE)))
        canon = pairs.filter(u < F.lit(float(p_edge)))
    return canon.union(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
