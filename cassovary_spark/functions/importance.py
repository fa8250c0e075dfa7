"""DSIR-style importance weighting for domain-targeted data selection
(Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023 — the hashed-n-gram variant).

Given a large raw corpus and a (much smaller) target-domain sample, score
every corpus document by how target-like its hashed n-gram distribution
is: log w(doc) = sum over the doc's grams g of
log( p_target(bucket(g)) / p_corpus(bucket(g)) ), with Laplace smoothing
over a fixed bucket count. Downstream selection samples documents with
probability proportional to exp(log w) (Gumbel top-k or threshold) — this
module emits the log-weights, which is the expensive distributed part.

Scale posture:
- Both feature distributions reduce to ``buckets`` rows via
  partial-aggregating groupBys (map-side combine; the reduce side is 256
  rows no matter the corpus size).
- The per-doc scoring pass joins exploded grams against the BROADCAST
  256-row log-ratio table and sums per doc — one shuffle keyed by doc id,
  at gram cardinality before the sum's map-side partial aggregation.
- Hashing is the engine-wide md5-long contract, so the DuckDB oracle
  replays weights bit-for-bit (no RNG, no partitioning sensitivity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassovary_spark.functions.text import _tokens, word_ngrams


def _hashed_grams(docs: DataFrame, text_col: str, id_col: str, buckets: int) -> DataFrame:
    """Explode each doc into hashed (uni+bi)gram bucket ids: one row per
    gram OCCURRENCE (DSIR counts occurrences, not distinct grams)."""
    toks = _tokens(F.lower(F.col(text_col)))
    grams = F.concat(toks, word_ngrams(toks, 2))
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("gram")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("gram")), 1, 13), 16, 10)
        .cast("long") % buckets
    ).alias("bucket")
    return exploded.select("doc_id", bucket)


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 256,
    smoothing: float = 1.0,
) -> DataFrame:
    """``(doc_id, n_grams, log_weight)`` per corpus document; higher
    ``log_weight`` = more target-like. Docs with zero grams get weight 0."""
    c_grams = _hashed_grams(corpus, text_col, id_col, buckets)
    t_grams = _hashed_grams(target, text_col, id_col, buckets)

    # 256-row ratio table; outer-join the two distributions so buckets seen
    # in only one side still score (smoothing gives the absent side mass).
    # Totals are whole-frame window sums over the 256-row table — fully
    # lazy, no driver-side count() actions, one job for the whole ratio
    # computation when the broadcast materializes.
    from pyspark.sql import Window

    whole = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    all_buckets = corpus.sparkSession.range(buckets).select(F.col("id").alias("bucket"))
    ratios = (
        all_buckets.join(
            t_grams.groupBy("bucket").agg(F.count("*").alias("tn")), "bucket", "left"
        )
        .join(c_grams.groupBy("bucket").agg(F.count("*").alias("cn")), "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("tn"), F.lit(0)).alias("tn"),
            F.coalesce(F.col("cn"), F.lit(0)).alias("cn"),
        )
        .select(
            "bucket",
            (
                F.log(
                    (F.col("tn") + F.lit(smoothing))
                    / (F.sum("tn").over(whole) + F.lit(smoothing * buckets))
                )
                - F.log(
                    (F.col("cn") + F.lit(smoothing))
                    / (F.sum("cn").over(whole) + F.lit(smoothing * buckets))
                )
            ).alias("log_ratio"),
        )
    )
    scored = (
        c_grams.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.round(F.sum("log_ratio"), 6).alias("log_weight"),
        )
    )
    # keep zero-gram docs with weight 0 (selection treats them as neutral)
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 256,
    smoothing: float = 1.0,
    seed: str = "dsir",
) -> DataFrame:
    """The selection stage of DSIR: sample ``k`` corpus documents with
    probability proportional to exp(log_weight) via the Gumbel-top-k trick
    (perturb each log-weight with an independent Gumbel draw, keep the k
    largest). The Gumbel draws come from the md5-long stream (seeded by
    ``seed``|doc_id), so selection is deterministic, partitioning-free,
    and DuckDB-replayable.

    Scale: orderBy().limit(k) compiles to TakeOrderedAndProject —
    per-partition top-k then a k-row merge on the driver; nothing global
    sorts. Returns ``(doc_id, n_grams, log_weight, sel_score)``."""
    w = dsir_weights(corpus, target, text_col, id_col, buckets, smoothing)
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}|"), F.col("doc_id").cast("string"))),
                1, 13,
            ),
            16, 10,
        ).cast("long")
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 52))
    gumbel = -F.log(-F.log(u))
    return (
        w.withColumn("sel_score", F.round(F.col("log_weight") + gumbel, 6))
        .orderBy(F.desc("sel_score"), F.asc("doc_id"))
        .limit(k)
    )
