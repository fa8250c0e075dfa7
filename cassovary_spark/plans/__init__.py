"""Physical layout planning: dual-orientation edge copies, hub salting,
degree bucketing — the engine-level layout decisions Catalyst doesn't make."""

from cassovary_spark.plans.layout import (
    DualOrientationEdges,
    salted_gather_sum,
    degree_buckets,
)

__all__ = ["DualOrientationEdges", "salted_gather_sum", "degree_buckets"]
