"""Multi-dimensional file layout (Z-order) for parquet data skipping.

At 100 TB the scan cost of a query with predicates on two+ columns is
set by how many row groups the parquet reader can PRUNE from min/max
stats. A single-column sort gives perfect pruning on one column and none
on the others; interleaving the columns' bits (Morton / Z-order — the
same layout Delta's OPTIMIZE ZORDER and Iceberg's sort orders target)
bounds every file's extent in EVERY indexed column, so multi-predicate
scans skip most files.

Everything here is plain Catalyst integer arithmetic (shift/and/or
inside whole-stage codegen) plus one range repartition — no UDFs, no
driver round-trips beyond the 1-row min/max bounds aggregate.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: Sequence, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of the given integer columns into
    one Morton code: column j contributes its bit i at output position
    ``i * n + j``. Inputs must already lie in ``[0, 2**bits)`` — use
    zorder_layout for automatic min/max normalization."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    if n < 1:
        raise ValueError("zorder_value needs at least one column")
    total = None
    for j, c in enumerate(cs):
        c = c.cast("bigint")
        for i in range(bits):
            term = F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            total = term if total is None else total.bitwiseOR(term)
    return total


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    n_files: int,
    bits: int = 16,
    zcol: str = "__z",
) -> DataFrame:
    """Lay ``df`` out in Z-order over ``cols``: each column is linearly
    rescaled to ``[0, 2**bits)`` by its global min/max (one tiny
    aggregate, broadcast back — no sampled quantiles, deterministic),
    the Morton code is computed in codegen, and the frame is range-
    partitioned into ``n_files`` partitions sorted by the code. Writing
    the result with one file per partition gives parquet row groups
    whose min/max extents are tight in EVERY ``cols`` member.

    The range partitioner samples the z column to pick balanced split
    points, so skew in the raw columns does not produce fat files."""
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{i}") for i, c in enumerate(cols)],
    )
    scaled = df.join(F.broadcast(bounds))
    top = (1 << bits) - 1
    norm = []
    for i, c in enumerate(cols):
        lo, hi = F.col(f"__lo_{i}"), F.col(f"__hi_{i}")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        norm.append(
            F.least(
                F.floor((F.col(c).cast("double") - lo) / span * top).cast("bigint"),
                F.lit(top),
            )
        )
    out = (
        scaled.withColumn(zcol, zorder_value(norm, bits))
        .drop(*[f"__lo_{i}" for i in range(len(cols))])
        .drop(*[f"__hi_{i}" for i in range(len(cols))])
    )
    return out.repartitionByRange(n_files, zcol).sortWithinPartitions(zcol)
