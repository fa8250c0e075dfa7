"""Bipartite iterative link analysis (SALSA-style weight flow).

Reference: graph/bipartite/IterativeLinkAnalyzer.scala:36-183. Semantics:
- the analyzed subgraph is the supplied left vertices, their (left -> right)
  edges, and the induced right vertices (initial weight 0)
- odd iteration k (left -> right, reset = reset_prob_right):
    w_right = reset * init_right(=0) + (1-reset) * sum_{l->r} w_left/outdeg(l)
- even iteration k (right -> left, reset = reset_prob_left):
    w_left = reset * init_left + (1-reset) * sum_{l->r} w_right/indeg(r)
- degrees are within the subgraph (numNeighbors, :62-66)
- the final pass on each side records the top-k contributing sources per
  destination ordered by contributor weight (:41-44; SmallBoundedPriorityQueue
  is weight-ordered with unspecified ties — here ties break by id ASC for
  determinism)

Scale design: two static oriented edge tables (by left id, by right id) and a
weight table per side; each pass is one co-partitioned join + groupBy.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassovary_spark.checkpoint import StateScratch, materialize


# shared workaround for window-order-unstable collect_list (observed
# reordering at sf0.01) — single definition lives in tourists
from cassovary_spark.operators.tourists import _ranked_list  # noqa: E402


@dataclass
class BipartiteAnalysis:
    left: DataFrame   # (id, weight, contributors: array<long>)
    right: DataFrame  # (id, weight, contributors: array<long>)


def _bipartite_local(
    spark,
    edges: DataFrame,
    left_weights: DataFrame,
    num_iterations: int,
    reset_prob_left: float,
    reset_prob_right: float,
    num_top_contributors: int,
    rounding: int | None,
) -> BipartiteAnalysis:
    """Numpy twin route for sub-threshold graphs (COST-aware engine choice,
    operators/local_engine.py) — one Arrow transfer of edges + supplied
    weights, bincount flow passes, equality-tested vs the distributed path
    (tests/test_bipartite.py). Results return through an arrow Table (+ the
    scratch-parquet spill past RESULT_SCRATCH_THRESHOLD rows — the
    LocalTableScan-tax rule): the r5 path built per-row Python tuples,
    which at 160k-vertex sides cost seconds per downstream action (r6)."""
    import numpy as np

    from cassovary_spark.operators import local_engine as LE

    epdf = edges.select("src", "dst").toPandas()
    lpdf = left_weights.select("id", "weight").toPandas()
    l_ids, lw, l_c, r_ids, rw, r_c = LE.bipartite_numpy(
        epdf["src"].to_numpy(np.int64),
        epdf["dst"].to_numpy(np.int64),
        lpdf["id"].to_numpy(np.int64),
        lpdf["weight"].to_numpy(np.float64),
        num_iterations,
        reset_prob_left,
        reset_prob_right,
        num_top_contributors,
        rounding,
    )
    import pyarrow as pa

    schema = "id long, weight double, contributors array<bigint>"

    def side(ids, w, contribs):
        tbl = pa.table(
            {
                "id": pa.array(np.asarray(ids, dtype=np.int64), type=pa.int64()),
                "weight": pa.array(np.asarray(w, dtype=np.float64), type=pa.float64()),
                "contributors": pa.array(
                    [list(map(int, c)) for c in contribs], type=pa.list_(pa.int64())
                ),
            }
        )
        return LE.arrow_result_df(spark, tbl, schema)

    return BipartiteAnalysis(side(l_ids, lw, l_c), side(r_ids, rw, r_c))


def bipartite_link_analysis(
    edges: DataFrame,
    left_weights: DataFrame,
    num_iterations: int = 2,
    reset_prob_left: float = 0.0,
    reset_prob_right: float = 0.0,
    num_top_contributors: int = 3,
    num_partitions: int | None = None,
    contributor_weight_rounding: int | None = None,
    engine: str = "auto",
) -> BipartiteAnalysis:
    """``edges`` are left->right pairs (src=left id, dst=right id);
    ``left_weights`` is ``(id, weight)`` initial left-side weights (the
    SuppliedNodeInfo seq). Ids may overlap across sides (distinct spaces
    recommended).

    ``contributor_weight_rounding``: round contributor weights to this many
    decimals before ranking — float-noise-stable ordering for cross-engine
    comparisons (the reference's priority queue has unspecified tie order,
    so any deterministic refinement is valid)."""
    spark = edges.sparkSession
    from cassovary_spark.plans import LOCAL_EDGE_THRESHOLD, choose_partitions

    # bipartite's numpy twin is NOT O(m): the final-pass top-k contributor
    # recording lexsorts the full edge flow (O(m log m) single-threaded), so
    # its local/distributed crossover sits well below the memory-budget
    # threshold the O(m)-kernel operators use (r6 measured: 10.4s local vs
    # 8.8s distributed at 6M edges / local[32]) — cap it at 4M edges.
    _BIPARTITE_LOCAL_CAP = 4_000_000
    m0 = edges.count()
    if engine == "auto":
        engine = (
            "local"
            if m0 <= min(LOCAL_EDGE_THRESHOLD, _BIPARTITE_LOCAL_CAP)
            else "distributed"
        )
    if engine == "local":
        return _bipartite_local(
            spark, edges, left_weights, num_iterations, reset_prob_left,
            reset_prob_right, num_top_contributors, contributor_weight_rounding,
        )

    p = choose_partitions(spark, m0, num_partitions)

    # subgraph restriction: only edges whose left endpoint was supplied
    e = (
        edges.select("src", "dst")
        .join(left_weights.select(F.col("id").alias("src")), "src", "left_semi")
        .repartition(p, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    ldeg = e.groupBy("src").agg(F.count("*").alias("ldeg"))
    rdeg = e.groupBy("dst").agg(F.count("*").alias("rdeg"))

    lw0 = (
        left_weights.select("id", F.col("weight").alias("init"))
        .join(ldeg.withColumnRenamed("src", "id"), "id", "left")
        .fillna(0, subset=["ldeg"])
        .persist()
    )
    scratch = StateScratch(spark)
    # contributor frames reference the superstep-state files live at compute
    # time; materialize them in their own scratch so later state eviction
    # (keep_last) can't delete files they still read lazily
    contrib_scratch = StateScratch(spark, keep_last=2)
    lw = scratch.roundtrip(lw0.select("id", F.col("init").alias("weight"), "init", "ldeg"))
    rw = scratch.roundtrip(
        rdeg.select(F.col("dst").alias("id"), F.lit(0.0).alias("weight"), "rdeg")
    )

    l_contrib = r_contrib = None
    for it in range(1, num_iterations + 1):
        last = it >= num_iterations - 1
        if it % 2 == 1:  # left -> right, reset prob on right (init 0)
            flows = (
                e.join(
                    lw.select(F.col("id").alias("src"), "weight", "ldeg"), "src"
                )
                .select(
                    "src",
                    "dst",
                    (
                        (F.col("weight") / F.col("ldeg"))
                        * F.lit(1.0 - reset_prob_right)
                    ).alias("flow"),
                    F.col("weight").alias("src_weight"),
                )
            )
            agg = flows.groupBy("dst").agg(F.sum("flow").alias("gathered"))
            rw = scratch.roundtrip(
                rw.select("id", "rdeg")
                .join(agg.withColumnRenamed("dst", "id"), "id", "left")
                .select(
                    "id",
                    F.coalesce("gathered", F.lit(0.0)).alias("weight"),
                    "rdeg",
                )
            )
            if last:
                rank_w = (
                    F.round("src_weight", contributor_weight_rounding)
                    if contributor_weight_rounding is not None
                    else F.col("src_weight")
                )
                w = Window.partitionBy("dst").orderBy(
                    rank_w.desc(), F.asc("src")
                )
                r_contrib = contrib_scratch.roundtrip(
                    flows.withColumn("rn", F.row_number().over(w))
                    .filter(F.col("rn") <= num_top_contributors)
                    .groupBy(F.col("dst").alias("id"))
                    .agg(_ranked_list("src").alias("contributors"))
                )
        else:  # right -> left, reset prob on left
            flows = (
                e.join(
                    rw.select(F.col("id").alias("dst"), "weight", "rdeg"), "dst"
                )
                .select(
                    "src",
                    "dst",
                    (
                        (F.col("weight") / F.col("rdeg"))
                        * F.lit(1.0 - reset_prob_left)
                    ).alias("flow"),
                    F.col("weight").alias("src_weight"),
                )
            )
            agg = flows.groupBy("src").agg(F.sum("flow").alias("gathered"))
            lw = scratch.roundtrip(
                lw.select("id", "init", "ldeg")
                .join(agg.withColumnRenamed("src", "id"), "id", "left")
                .select(
                    "id",
                    (
                        F.lit(reset_prob_left) * F.col("init")
                        + F.coalesce("gathered", F.lit(0.0))
                    ).alias("weight"),
                    "init",
                    "ldeg",
                )
            )
            if last:
                rank_w = (
                    F.round("src_weight", contributor_weight_rounding)
                    if contributor_weight_rounding is not None
                    else F.col("src_weight")
                )
                w = Window.partitionBy("src").orderBy(
                    rank_w.desc(), F.asc("dst")
                )
                l_contrib = contrib_scratch.roundtrip(
                    flows.withColumn("rn", F.row_number().over(w))
                    .filter(F.col("rn") <= num_top_contributors)
                    .groupBy(F.col("src").alias("id"))
                    .agg(_ranked_list("dst").alias("contributors"))
                )

    empty = F.array().cast("array<bigint>")
    left_out = lw.select("id", "weight").join(
        l_contrib if l_contrib is not None else lw.select("id").withColumn("contributors", empty),
        "id",
        "left",
    ).select("id", "weight", F.coalesce("contributors", empty).alias("contributors"))
    right_out = rw.select("id", "weight").join(
        r_contrib if r_contrib is not None else rw.select("id").withColumn("contributors", empty),
        "id",
        "left",
    ).select("id", "weight", F.coalesce("contributors", empty).alias("contributors"))
    left_out = materialize(left_out)
    right_out = materialize(right_out)
    scratch.close()
    contrib_scratch.close()
    e.unpersist()
    lw0.unpersist()
    return BipartiteAnalysis(left_out, right_out)
