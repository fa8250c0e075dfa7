"""HITS (hubs & authorities), matching the reference iteration exactly
(algorithms/linkanalysis/Hits.scala):

- init: hubs = 1/N on existing nodes, authorities = 0 (:75-79)
- per iteration (:81-103):
    auth'[v] = sum_{u->v} hubs[u]            (computed first)
    hub'[u]  = sum_{u->v} auth'[v]           (uses the NEW authorities!)
    scale both by their MAX (scale(), :53-56; d <= 0 leaves unscaled)
- error = T1(hubs, hub') computed on the max-scaled hubs (:102)
- terminate: iteration >= max_iterations (default 100) or error <= tolerance
  (1e-8) (HitsParams :24-27, LinkAnalysis.scala:98-100)
- postRun with normalize=True: scale both by their SUM (:105-110)

Scale: two co-partitioned join+groupBy passes per superstep over a stationary
by-src / by-dst dual-orientation edge layout (the distributed analog of the
reference's direction-aware gather/scatter choice, Hits.scala:85-99).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from cassovary_spark.checkpoint import StateScratch, materialize
from cassovary_spark.graph import vertices_of


@dataclass
class HitsResult:
    scores: DataFrame  # (id, hub, authority)
    error: float
    iterations: int
    history: list[dict] = field(default_factory=list)


def hits(
    edges: DataFrame,
    max_iterations: int | None = 100,
    tolerance: float = 1e-8,
    normalize: bool = True,
    num_partitions: int | None = None,
    engine: str = "auto",
) -> HitsResult:
    spark = edges.sparkSession
    from cassovary_spark.plans import (
        LOCAL_EDGE_THRESHOLD,
        choose_partitions,
        superstep_conf,
        update_join_hint,
    )

    _upd = update_join_hint().lower()

    m0 = edges.count()
    if engine == "auto":
        engine = "local" if m0 <= LOCAL_EDGE_THRESHOLD else "distributed"
    if engine == "local":
        from cassovary_spark.operators import local_engine as LE

        ids, si, di = LE.edges_to_numpy(edges)
        if len(ids) == 0:
            empty = spark.createDataFrame([], "id long, hub double, authority double")
            return HitsResult(empty, 0.0, 0)
        hub, auth, error, its, history = LE.hits_numpy(
            ids, si, di, max_iterations, tolerance
        )
        if normalize:
            hs = hub.sum() or 1.0
            as_ = auth.sum() or 1.0
            hub, auth = hub / hs, auth / as_
        scores = LE.result_df(
            spark, ids, {"hub": hub, "authority": auth},
            "id long, hub double, authority double",
        )
        return HitsResult(scores, error, its, history)

    p = choose_partitions(spark, m0, num_partitions)

    verts = vertices_of(edges).repartition(p, "id").sortWithinPartitions("id").persist()
    n = verts.count()
    if n == 0:
        empty = spark.createDataFrame([], "id long, hub double, authority double")
        return HitsResult(empty, 0.0, 0)

    # dual orientation: gather-for-auth joins on src, gather-for-hub on dst
    by_src = edges.select("src", "dst").repartition(p, "src").sortWithinPartitions("src").persist()
    by_dst = edges.select("src", "dst").repartition(p, "dst").sortWithinPartitions("dst").persist()

    # state feeds TWO branches of each superstep's join tree (auth gather +
    # hub gather over the fresh auth), so per-superstep stats must be RESET,
    # not just lineage-truncated — see checkpoint.StateScratch.
    scratch = StateScratch(spark)
    state = scratch.roundtrip(
        verts.select(
            "id", F.lit(1.0 / n).alias("hub"), F.lit(0.0).alias("authority")
        ),
        bucket_by="id", num_buckets=p,
    )
    error = 100.0 + tolerance
    iteration = 0
    history: list[dict] = []

    def terminated(it: int, err: float) -> bool:
        if max_iterations is not None and it >= max_iterations:
            return True
        return err <= tolerance

    with superstep_conf(spark, p, m0):
      while not terminated(iteration, error):
          auth_raw = (
              by_src.hint("merge").join(state.select(F.col("id").alias("src"), "hub"), "src")
              .groupBy(F.col("dst").alias("id"))
              .agg(F.sum("hub").alias("a_raw"))
          )
          auth_full = (
              verts.join(auth_raw.hint(_upd), "id", "left")
              .select("id", F.coalesce("a_raw", F.lit(0.0)).alias("a_raw"))
              .repartition(p, "id")
          )
          auth_full = materialize(auth_full)

          hub_raw = (
              by_dst.hint("merge").join(auth_full.select(F.col("id").alias("dst"), "a_raw"), "dst")
              .groupBy(F.col("src").alias("id"))
              .agg(F.sum("a_raw").alias("h_raw"))
          )
          # carry the previous (normalized) hub along and collect the per-side
          # maxes via ``observe`` DURING the materialization — the reference's
          # scale-by-max pass (Hits.scala:53-56,101) without its own scan
          # both non-state sides hash-build (update_join_hint): hub_raw is a
          # fresh aggregate and the first join's SHJ output loses the sort
          # order SMJ would have needed from the second
          joined = (
              state.select("id", F.col("hub").alias("prev_hub"))
              .join(hub_raw.hint(_upd), "id", "left")
              .join(auth_full.hint(_upd), "id")
              .select(
                  "id", F.coalesce("h_raw", F.lit(0.0)).alias("h_raw"),
                  "a_raw", "prev_hub",
              )
              .repartition(p, "id")
          )
          obs_max = Observation()
          joined = scratch.roundtrip(
              joined.observe(
                  obs_max, F.max("h_raw").alias("hmax"), F.max("a_raw").alias("amax")
              ),
              bucket_by="id", num_buckets=p,
          )
          maxes = obs_max.get
          hmax = maxes["hmax"] if (maxes["hmax"] or 0) > 0 else 1.0
          amax = maxes["amax"] if (maxes["amax"] or 0) > 0 else 1.0

          # normalization write doubles as the T1-error scan (observe again)
          obs_err = Observation()
          new_state = scratch.roundtrip(
              joined.select(
                  "id",
                  (F.col("h_raw") / F.lit(hmax)).alias("hub"),
                  (F.col("a_raw") / F.lit(amax)).alias("authority"),
                  "prev_hub",
              )
              .observe(
                  obs_err,
                  F.sum(F.abs(F.col("prev_hub") - F.col("hub"))).alias("e"),
              )
              .drop("prev_hub"),
              bucket_by="id", num_buckets=p,
          )
          error = obs_err.get["e"]
          iteration += 1
          history.append({"iteration": iteration, "error": error})
          state = new_state

    if normalize:
        sums = state.agg(F.sum("hub").alias("hs"), F.sum("authority").alias("as_")).first()
        hs = sums["hs"] if (sums["hs"] or 0) > 0 else 1.0
        as_ = sums["as_"] if (sums["as_"] or 0) > 0 else 1.0
        state = state.select(
            "id",
            (F.col("hub") / F.lit(hs)).alias("hub"),
            (F.col("authority") / F.lit(as_)).alias("authority"),
        )

    result = materialize(state.select("id", "hub", "authority"))
    scratch.close()
    verts.unpersist()
    by_src.unpersist()
    by_dst.unpersist()
    return HitsResult(result, error, iteration, history)
