"""Temporal join operators Spark lacks as built-ins: AS-OF join and
bucketed range join.

Both are implemented as compositions of existing DataFrame ops (no UDFs,
no per-row Python), picked for their 100 TB shuffle shape:

* ``asof_join`` — the union-and-carry-forward plan: tag both streams,
  union, ONE shuffle on (key, time), then ``last(..., ignorenulls)``
  over an unbounded-preceding window carries each right-side row forward
  to every later left-side row. Cost = one shuffle + one sort of
  |L| + |R| — strictly better than the naive windowed self-join
  (|L| x |R| pairs per key) and equivalent to what DuckDB/Pandas
  ``merge_asof`` do sort-side.
* ``range_join_binned`` — inequality joins in Spark fall back to
  BroadcastNestedLoopJoin (every left row probes every range). Binning
  the value domain turns it into an EQUI-join on the bin id: each range
  explodes into the bins it overlaps (tiny dim side), each probe row
  computes its bin arithmetically, and the residual range predicate
  filters inside the hash join. At scale this is the difference between
  O(|L| * |ranges|) and O(|L|).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: Optional[List[str]] = None,
    tolerance: Optional[str] = None,
    suffix: str = "",
) -> DataFrame:
    """For every left row, attach the LATEST right row with
    ``right_time <= left_time`` for the same ``on`` key (backward as-of
    join, the pandas.merge_asof / DuckDB ASOF JOIN semantics; ties on
    equal time match).

    ``value_cols``: right columns to carry (default: all non-key,
    non-time). ``tolerance``: optional max lookback as a SQL interval
    string (e.g. ``"7 days"``) — matches older than that become null.
    ``suffix``: appended to carried column names; REQUIRED when a value
    column name also exists on the left (merge_asof's suffixes) — the
    union would otherwise merge both sides' values into one column and
    the output would carry two identically-named columns.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_time)
    ]
    clashes = [c for c in value_cols if (c + suffix) in left.columns]
    if clashes:
        raise ValueError(
            f"right value column(s) {clashes} collide with left columns; "
            "pass suffix= (merge_asof-style) or rename"
        )
    lt = F.col(left_time)

    l_tagged = left.withColumn("__t", lt.cast("timestamp")).withColumn(
        "__is_l", F.lit(1)
    )
    r_tagged = (
        right.select(
            F.col(on),
            F.col(right_time).cast("timestamp").alias("__t"),
            *[F.col(c).alias(c + suffix) for c in value_cols],
        )
        .withColumn("__is_l", F.lit(0))
    )
    value_cols = [c + suffix for c in value_cols]
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # right rows sort BEFORE left rows at the same instant so equal-time
    # matches are visible to the left row (asof semantics: <=)
    w = (
        W.partitionBy(on)
        .orderBy(F.col("__t"), F.col("__is_l"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = unioned
    for c in value_cols:
        carried = carried.withColumn(
            f"__asof_{c}",
            F.last(F.when(F.col("__is_l") == 0, F.col(c)), ignorenulls=True).over(w),
        )
    carried = carried.withColumn(
        "__asof_t",
        F.last(F.when(F.col("__is_l") == 0, F.col("__t")), ignorenulls=True).over(w),
    )
    out = carried.where(F.col("__is_l") == 1)
    if tolerance is not None:
        within = F.col("__asof_t") >= F.col("__t") - F.expr(f"INTERVAL {tolerance}")
        for c in value_cols:
            out = out.withColumn(f"__asof_{c}", F.when(within, F.col(f"__asof_{c}")))
    keep = [F.col(c) for c in left.columns] + [
        F.col(f"__asof_{c}").alias(c) for c in value_cols
    ]
    return out.select(*keep)


def range_join_binned(
    probe: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = 1.0,
) -> DataFrame:
    """Join each probe row to every range with ``lo <= value < hi`` via
    bin-exploded EQUI-join (see module docstring). ``ranges`` is assumed
    dimension-sized (broadcast); bin_width should be on the order of the
    typical range width so each range explodes into O(1) bins."""
    lo_bin = F.floor(F.col(lo_col) / bin_width).cast("long")
    # INCLUSIVE stop bin: a range ending exactly on a bin edge explodes
    # into one bin it cannot match, and the residual predicate removes
    # it — an epsilon-adjusted exclusive stop would instead DROP the top
    # bin for hi values within the epsilon of an edge (silent misses)
    # and be rounding-absorbed at large magnitudes. Degenerate ranges
    # (hi <= lo) produce no bins (explode of null drops the row) instead
    # of a descending bogus sequence.
    hi_bin = F.floor(F.col(hi_col) / bin_width).cast("long")
    binned_ranges = ranges.withColumn(
        "__bin",
        F.explode(
            F.when(F.col(hi_col) > F.col(lo_col), F.sequence(lo_bin, hi_bin))
        ),
    )
    probe_binned = probe.withColumn(
        "__bin", F.floor(F.col(value_col) / bin_width).cast("long")
    )
    joined = probe_binned.join(F.broadcast(binned_ranges), "__bin", "inner").where(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    )
    return joined.drop("__bin")
