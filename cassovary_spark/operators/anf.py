"""Approximate neighborhood function via Flajolet-Martin bit-OR supersteps
(the HyperANF/ANF family: Palmer-Gibbons-Faloutsos "ANF" KDD'02,
Boldi-Rosa-Vigna "HyperANF" WWW'11).

NF(t) = sum over vertices v of |{u : dist(v,u) <= t}| — the curve behind
effective-diameter and average-distance estimates. Exact computation is
all-pairs BFS (O(V*E)); the sketch version keeps one tiny FM bitmask per
vertex per register and grows it with ONE bit_or gather per superstep —
the same co-partitioned edge join as a PageRank superstep, with 8*R bytes
of state per vertex, so a 10^12-edge run costs T supersteps of the
already-benchmarked gather machinery.

Determinism contract: register hashes use the engine-wide md5-long scheme
(first 13 hex chars of md5 as a 52-bit BIGINT — sources/transcripts.py),
so the DuckDB oracle replays the identical sketch bit-for-bit; there is no
RNG, and results are independent of partitioning.

Reference tie-in: the reference estimates reachability volumes by running
bounded BFS per node (graph/Traverser.scala:426); this operator is the
all-sources-at-once scale path for the same question.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassovary_spark.checkpoint import StateScratch
from cassovary_spark.graph import mutualize, vertices_of

# FM bias correction (Flajolet-Martin 1985): E[2^R] = phi * n
_FM_PHI = 0.77351
# cap the initial bit position so OR-chains and the +1 in the lowest-zero
# scan stay far from the sign bit of a 64-bit long on both engines
_MAX_POS = 50


def _md5long(col):
    """52-bit BIGINT from the md5 prefix — DuckDB-replayable hash contract."""
    return F.conv(F.substring(F.md5(col), 1, 13), 16, 10).cast("long")


def neighborhood_function(
    edges: DataFrame,
    iterations: int = 3,
    registers: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """``(t, nf)`` for t = 1..iterations: the estimated number of (ordered)
    vertex pairs within distance t on the undirected closure, including
    the trivial pair (v, v).

    Per-vertex estimate at each t = 2^(mean over registers of the lowest
    UNSET bit index of the OR'd sketch) / phi; NF(t) sums these."""
    spark = edges.sparkSession
    from cassovary_spark.plans import choose_partitions, superstep_conf

    m0 = edges.count()
    p = choose_partitions(spark, m0, num_partitions)
    und = mutualize(edges).repartition(p, "dst").sortWithinPartitions("dst").persist()
    verts = vertices_of(edges)

    regs = list(range(registers))
    # initial sketch per register: one bit at the FM position of the
    # register-salted vertex hash. lowest-set-bit index of h is
    # bit_count((h & -h) - 1); capped at _MAX_POS. Built as SQL exprs
    # because shiftleft()'s bit count must be a column-derived value.
    init_cols = []
    for r in regs:
        h = (
            "CAST(conv(substring(md5(concat('anf" + str(r) + "|', "
            "CAST(id AS STRING))), 1, 13), 16, 10) AS BIGINT)"
        )
        pos = f"least(bit_count(({h} & -{h}) - 1), {_MAX_POS})"
        init_cols.append(F.expr(f"shiftleft(CAST(1 AS BIGINT), {pos})").alias(f"b{r}"))

    scratch = StateScratch(spark)
    out_rows = []
    try:
      with superstep_conf(spark, p, m0):
        state = scratch.roundtrip(
            verts.select("id", *init_cols).repartition(p, "id"),
            bucket_by="id", num_buckets=p,
        )
        for t in range(1, iterations + 1):
            gathered = (
                und.hint("merge")
                .join(state.withColumnRenamed("id", "dst"), "dst")
                .groupBy(F.col("src").alias("id"))
                .agg(*[F.bit_or(f"b{r}").alias(f"g{r}") for r in regs])
            )
            state = scratch.roundtrip(
                state.join(gathered, "id", "left").select(
                    "id",
                    *[
                        (
                            F.col(f"b{r}").bitwiseOR(
                                F.coalesce(F.col(f"g{r}"), F.lit(0).cast("long"))
                            )
                        ).alias(f"b{r}")
                        for r in regs
                    ],
                ),
                bucket_by="id", num_buckets=p,
            )
            # lowest UNSET bit index of b: bit_count((~b & (b+1)) - 1)
            idx_cols = [
                F.bit_count(
                    (F.bitwise_not(F.col(f"b{r}")).bitwiseAND(F.col(f"b{r}") + F.lit(1)))
                    - F.lit(1)
                ).cast("double")
                for r in regs
            ]
            mean_idx = sum(idx_cols[1:], idx_cols[0]) / float(registers)
            nf = (
                state.select(
                    (F.pow(F.lit(2.0), mean_idx) / F.lit(_FM_PHI)).alias("est")
                )
                .agg(F.round(F.sum("est"), 4).alias("nf"))
                .first()[0]
            )
            out_rows.append((t, float(nf)))
    finally:
        scratch.close()
        und.unpersist()
    return spark.createDataFrame(out_rows, "t int, nf double")
