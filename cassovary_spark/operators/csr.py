"""CSR-block gather-scatter kernels: vectorized pandas/Arrow UDF fast path.

The reference's hot loop streams a process-local CSR while reading a rank
array (SharedArrayBasedDirectedGraph.scala; PageRank.scala:95-111). The
distributed analog here: the weighted edge table is hash-partitioned by
``src`` into blocks; each block joined with the rank slice becomes ONE Arrow
batch stream per partition, and the gather (contrib = w * rank, combined per
destination) runs as NumPy/pandas column kernels inside ``mapInPandas`` — a
per-partition CSR-style combine with zero per-row Python. The cross-block
combine stays a Spark hash aggregate.

This is an alternative physical strategy for the same logical gather;
``pagerank(gather_engine="pandas")`` uses it, and the equality test pins it
to the join+groupBy path bit-for-bit (both sum in float64).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pandas_gather_sum(
    wedges: DataFrame,
    ranks: DataFrame,
    rank_col: str = "pagerank",
    out_col: str = "gathered",
) -> DataFrame:
    """``sum_{src->dst} w * rank[src]`` grouped by dst, with the per-block
    partial combine in pandas/NumPy.

    ``wedges``: (src, dst, w) hash-partitioned by src (static, persisted).
    ``ranks``: (id, <rank_col>) — joined in co-partitioned, then each
    partition's rows stream through Arrow batches.
    """

    joined = wedges.hint("merge").join(
        ranks.select(F.col("id").alias("src"), F.col(rank_col).alias("_r")), "src"
    )

    def block_combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[int, float] = {}
        for pdf in batches:
            # vectorized contrib + per-destination combine (C-loop groupby,
            # the np.add.at-style accumulation over the block)
            contrib = pdf["w"].to_numpy() * pdf["_r"].to_numpy()
            part = pd.Series(contrib).groupby(pdf["dst"].to_numpy()).sum()
            for k, v in part.items():
                acc[k] = acc.get(k, 0.0) + v
        yield pd.DataFrame(
            {"dst": pd.Series(list(acc.keys()), dtype="int64"),
             "partial": pd.Series(list(acc.values()), dtype="float64")}
        )

    partials = joined.mapInPandas(block_combine, schema="dst long, partial double")
    return partials.groupBy("dst").agg(F.sum("partial").alias(out_col))
