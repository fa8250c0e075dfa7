"""Streaming incremental dedup: score arriving documents against a static
corpus :class:`~cassovary_spark.functions.dedup.DedupIndex`.

Two surfaces, matching what Structured Streaming can express:

- :func:`stream_exact_dedup` — a pure streaming DataFrame: the exact
  fingerprint verdict as a STREAM-STATIC left join (append-safe, no state,
  no watermark). Right for the common "drop exact dups at ingest" stage.
- :func:`stream_incremental_dedup_writer` — the FULL verdict (exact + LSH
  near-candidates + keep). The near count needs a per-doc aggregation over
  the bucket join and a join back per input row — a stream-stream shape
  Structured Streaming forbids in append mode — so this runs the BATCH
  operator (`functions.dedup.incremental_dedup`) on each micro-batch via
  ``foreachBatch``: bit-identical semantics to the daily batch job by
  construction (it IS the same operator), the standard Spark idiom for
  reusing batch logic in a stream.

The index is static for the life of the query (the daily
``DedupIndex.extend`` stays a batch step; restart the query — or back the
index with an Iceberg table — to pick up a new snapshot).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassovary_spark.functions.dedup import DedupIndex, _norm, incremental_dedup


def stream_exact_dedup(
    stream_docs: DataFrame,
    index: DedupIndex,
    broadcast_index: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-arriving-doc EXACT dedup verdict: ``(doc_id, exact_dup_of,
    keep_exact)`` as an append-mode streaming DataFrame.

    One stream-static left join on the normalized-text md5: each micro-batch
    probes the index fingerprints; every output row is final on arrival.
    ``broadcast_index=True`` broadcasts the fingerprint table (right when it
    fits executor memory); otherwise the planner picks, and a persisted or
    bucketed fingerprint table amortizes the per-micro-batch scan."""
    ifp = index.fingerprints
    if broadcast_index:
        ifp = F.broadcast(ifp)
    return (
        stream_docs.select(
            F.col(id_col).alias("doc_id"),
            F.md5(_norm(text_col)).alias("fp_md5"),
        )
        .join(ifp, "fp_md5", "left")
        .select(
            "doc_id",
            F.col("rep_id").alias("exact_dup_of"),
            F.col("rep_id").isNull().alias("keep_exact"),
        )
    )


def stream_incremental_dedup_writer(
    stream_docs: DataFrame,
    index: DedupIndex,
    output_path: str | None = None,
    foreach_batch: Callable[[DataFrame, int], None] | None = None,
    max_bucket_size: int | None = None,
    broadcast_batch: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Full incremental-dedup verdicts for a document stream, as a
    ``DataStreamWriter`` the caller triggers (``.start()`` /
    ``.trigger(availableNow=True)`` + checkpointLocation).

    Each micro-batch runs the batch operator
    (:func:`~cassovary_spark.functions.dedup.incremental_dedup`) against
    the static index — a micro-batch IS the daily shard, smaller — and
    either appends ``(doc_id, exact_dup_of, near_dup_count, keep)`` parquet
    under ``output_path`` or hands the verdict frame to ``foreach_batch``
    for a custom sink. Exactly one of the two must be given."""
    if (output_path is None) == (foreach_batch is None):
        raise ValueError("pass exactly one of output_path / foreach_batch")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        verdicts = incremental_dedup(
            batch_df,
            index,
            max_bucket_size=max_bucket_size,
            broadcast_batch=broadcast_batch,
            id_col=id_col,
            text_col=text_col,
        )
        if foreach_batch is not None:
            foreach_batch(verdicts, batch_id)
        else:
            verdicts.write.mode("append").parquet(output_path)

    return stream_docs.writeStream.foreachBatch(_process)
