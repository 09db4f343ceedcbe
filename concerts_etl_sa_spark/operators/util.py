"""Shared physical-plan helpers for operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def sorted_small(df: DataFrame, *cols) -> DataFrame:
    """Total order for a SMALL (aggregate/top-k/pair-list) result without
    ``orderBy``'s range-partitioner sampling job — which re-executes the
    entire upstream lineage once just to pick partition bounds. One
    explicit shuffle to a single partition + in-partition sort produces
    the identical total order in a single pass.

    Only for dimension-sized outputs (the callers' outputs are bounded by
    group counts / top-k / near-dup pair counts). A 100 TB-sized result
    should use ``orderBy`` and accept the sampling pass.
    """
    return df.repartition(1).sortWithinPartitions(*cols)
