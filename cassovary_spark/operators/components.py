"""Weakly-connected components via min-label propagation with pointer-jumping.

The reference has no named CC implementation — reachability is derivable from
``BreadthFirstTraverser`` (graph/Traverser.scala:426) — but the north rule
requires exact component assignments. Semantics: on the mutualized
(undirected) edge set, every vertex is labeled with the MINIMUM vertex id of
its component (deterministic, reference-free ground truth).

Scale design:
- "hash-min" superstep: label'(v) = min(label(v), min_{u~v} label(u)) — one
  co-partitioned join + partial-aggregating groupBy per superstep; converges
  in O(diameter) supersteps.
- pointer-jumping acceleration (label(v) <- label(label(v)), one self-join on
  the SMALL label table) collapses chains in O(log diameter) — the same idea
  as large-star/small-star (Kiveris et al., "Connected Components in
  MapReduce and Beyond") without rewriting the big edge table each round.
- convergence test: sum(label) is strictly decreasing until fixpoint (labels
  are per-vertex monotone non-increasing), so one tiny scalar agg per
  superstep detects the fixpoint with no extra join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from cassovary_spark.checkpoint import CheckpointStore, StateScratch, materialize
from cassovary_spark.graph import mutualize, vertices_of


def connected_components(
    edges: DataFrame,
    max_iterations: int | None = None,
    num_partitions: int | None = None,
    pointer_jump: bool = True,
    checkpoint: CheckpointStore | None = None,
    resume: bool = False,
    engine: str = "auto",
    stats: dict | None = None,
) -> DataFrame:
    """Exact weakly-connected components; returns ``(id, component)`` where
    ``component`` is the min vertex id in the component.

    ``stats``: optional caller-supplied dict the DISTRIBUTED engine fills
    with ``iterations`` and per-superstep ``superstep_walls`` (seconds) —
    the scaling harness's instrumentation (scripts/scaling_run.py); the
    numpy twin records ``iterations`` only."""
    spark = edges.sparkSession
    from cassovary_spark.plans import (
        LOCAL_EDGE_THRESHOLD,
        choose_partitions,
        superstep_conf,
        update_join_hint,
    )

    _UPD = update_join_hint()

    m0 = edges.count()
    if engine == "local" and (checkpoint is not None or resume):
        raise ValueError(
            "engine='local' cannot honor checkpoint/resume; "
            "use engine='distributed' (or 'auto', which routes around it)"
        )
    if engine == "auto" and checkpoint is None:
        engine = "local" if m0 <= LOCAL_EDGE_THRESHOLD else "distributed"
    if engine == "local":
        from cassovary_spark.operators import local_engine as LE

        ids, si, di = LE.edges_to_numpy(edges)
        if len(ids) == 0:
            return spark.createDataFrame([], "id long, component long")
        comp = LE.connected_components_numpy(ids, si, di)
        if stats is not None:
            stats["iterations"] = 0  # union-find, not superstep-iterative
        return LE.result_df(spark, ids, {"component": comp}, "id long, component long")

    p = choose_partitions(spark, m0, num_partitions)

    # the superstep join keys on dst (gather neighbor labels), so the static
    # edge table is partitioned AND sorted by dst — SMJ then never exchanges
    # or sorts the big side
    und = mutualize(edges).repartition(p, "dst").sortWithinPartitions("dst").persist()
    verts = vertices_of(edges).repartition(p, "id").sortWithinPartitions("id").persist()

    labels = None
    start_iter = 0
    if resume and checkpoint is not None:
        got = checkpoint.latest(spark)
        if got is not None:
            start_iter, labels, _meta = got
            labels = labels.repartition(p, "id")
    # labels enter the superstep through the neighbor gather, the least()
    # fallback, AND (with pointer_jump) a self-join — multiplicative stat
    # growth — so per-superstep stats are reset via StateScratch.
    scratch = StateScratch(spark)
    if labels is None:
        labels = verts.select("id", F.col("id").alias("component"))
    labels = scratch.roundtrip(labels, bucket_by="id", num_buckets=p)

    prev_sum = labels.agg(F.sum("component")).first()[0]
    iteration = start_iter
    import uuid as _uuid

    # registered once for the single-SQL superstep build (same policy as
    # pagerank: one spark.sql() call replaces ~12 py4j DataFrame-building
    # round-trips when the state is a catalog table)
    und_view = f"cassovary_cc_und_{_uuid.uuid4().hex[:12]}"
    und.createOrReplaceTempView(und_view)
    state_table = scratch.last_table
    # try/finally: a failure mid-superstep must not leak the temp view,
    # scratch tables, or the persisted frames for the session lifetime
    # (ADVICE r3)
    try:
      with superstep_conf(spark, p, m0):
        import time as _time

        while max_iterations is None or iteration < max_iterations:
            t_superstep = _time.time()
            if state_table is not None:
                # NO WITH clause: Spark 4.1's CTE planning loses the persisted
                # sorted view's ordering attributes when the CTE body contains
                # a merge join over it ("key not found: dst#N" in SortExec
                # during prepareForExecution) — inline subqueries plan fine and
                # identical subtrees still collapse to ReusedExchange
                gather = f"""
      SELECT /*+ MERGE(e) */ e.src AS id, min(l.component) AS nbr_component
      FROM {und_view} e JOIN {state_table} l ON e.dst = l.id
      GROUP BY e.src"""
                update = f"""SELECT /*+ {_UPD}(c) */ s.id,
         least(s.component, coalesce(c.nbr_component, s.component)) AS component
  FROM {state_table} s
  LEFT JOIN ({gather}
  ) c ON s.id = c.id"""
                if pointer_jump:
                    # label(v) <- label(label(v)) as TWO phases: materialize
                    # the gather+update once to scratch, then self-join the
                    # O(V) table. The previous inlined self-join of the
                    # update subquery looked free but the planner reused only
                    # one exchange — the O(E) gather aggregation ran TWICE
                    # per superstep (plan probe: 2x HashAggregate/SMJ over
                    # the edge view; measured: CC superstep ~4x a pagerank
                    # superstep at 64M edges). An extra O(V) scratch write is
                    # far cheaper than a second O(E) gather. Values are
                    # identical — the jump reads the same update rows.
                    upd = scratch.roundtrip(
                        spark.sql(update), bucket_by="id", num_buckets=p
                    )
                    upd_table = scratch.last_table
                    if upd_table is not None:
                        # SHUFFLE_HASH(lut): the probe side is keyed on
                        # `component` (unsorted, un-co-partitioned), so SMJ
                        # would sort BOTH sides after their exchanges; the
                        # hash build of the O(V) lut is the cheaper half
                        new_labels = spark.sql(f"""
  SELECT /*+ {_UPD}(lut) */ nl.id, coalesce(lut.component, nl.component) AS component
  FROM {upd_table} nl
  LEFT JOIN {upd_table} lut ON nl.component = lut.id""")
                    else:
                        lut = upd.select(
                            F.col("id").alias("component"),
                            F.col("component").alias("jump"),
                        )
                        new_labels = upd.join(
                            lut.hint(_UPD.lower()), "component", "left"
                        ).select(
                            "id", F.coalesce("jump", "component").alias("component")
                        )
                else:
                    new_labels = spark.sql(update)
            else:
                # DataFrame build: first iteration after resume/checkpoint,
                # or when bucketed catalog writes are unavailable
                nbr_min = (
                    und.hint("merge")
                    .join(labels.select(F.col("id").alias("dst"), "component"), "dst")
                    .groupBy(F.col("src").alias("id"))
                    .agg(F.min("component").alias("nbr_component"))
                )
                new_labels = (
                    labels.join(nbr_min.hint(_UPD.lower()), "id", "left")
                    .select(
                        "id",
                        F.least(
                            "component", F.coalesce("nbr_component", "component")
                        ).alias("component"),
                    )
                )
                if pointer_jump:
                    # same two-phase shape as the catalog branch: a lazy
                    # self-join would recompute the O(E) gather twice
                    upd = scratch.roundtrip(
                        new_labels.repartition(p, "id"),
                        bucket_by="id", num_buckets=p,
                    )
                    lut = upd.select(
                        F.col("id").alias("component"),
                        F.col("component").alias("jump"),
                    )
                    new_labels = upd.join(
                        lut.hint(_UPD.lower()), "component", "left"
                    ).select(
                        "id", F.coalesce("jump", "component").alias("component")
                    )
                new_labels = new_labels.repartition(p, "id")
            # convergence metric (Σ labels strictly decreases until fixpoint)
            # collected via observe during the state write — one job/superstep
            obs = Observation()
            new_labels = scratch.roundtrip(
                new_labels.observe(obs, F.sum("component").alias("s")),
                bucket_by="id", num_buckets=p,
            )
            state_table = scratch.last_table
            iteration += 1

            cur_sum = obs.get["s"]
            if stats is not None:
                stats.setdefault("superstep_walls", []).append(
                    round(_time.time() - t_superstep, 3)
                )
                stats["iterations"] = iteration
            labels = new_labels
            if checkpoint is not None:
                # the checkpoint store returns a non-catalog frame — the next
                # iteration must build from the DataFrame, not the stale table
                labels = checkpoint.save(
                    iteration, labels, {"error": float(prev_sum - cur_sum), "label_sum": cur_sum}
                )
                state_table = None
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum

      result = materialize(labels.select("id", "component"))
    finally:
        scratch.close()
        try:
            spark.catalog.dropTempView(und_view)
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
        und.unpersist()
        verts.unpersist()
    return result
