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


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: Optional[List[str]] = None,
    tolerance: Optional[str] = None,
    suffix: str = "",
    bucket_s: float = 3600.0,
) -> DataFrame:
    """Skew-hardened as-of join: same semantics as ``asof_join``, but the
    carry-forward window partitions on (key, time_bucket) instead of key
    alone, so a zipfian hot key (one source = 30% of all rows) spreads
    over as many tasks as it spans buckets rather than serializing its
    entire timeline through ONE task's sort.

    Two passes:

    1. in-bucket carry: the usual union + ``last(..., ignorenulls)``
       window, partitioned by (key, bucket) — each task sorts only one
       bucket's slice of the hot key;
    2. cross-bucket carry-in: per (key, bucket), the latest right row of
       the bucket (one row per pair) is carried across buckets with a
       key-partitioned window over the TINY per-bucket frame (rows =
       keys x buckets, not data rows), shifted one bucket back
       (``rowsBetween(unboundedPreceding, -1)``), then joined back.
       Left rows whose bucket has no earlier in-bucket match fall back
       to the carry-in.

    Costs one extra shuffle of the unioned frame vs ``asof_join`` — the
    price of skew immunity; prefer the plain form for well-distributed
    keys. ``bucket_s`` is the bucket width in seconds: size it so a hot
    key's per-bucket volume fits one task comfortably. When several
    right rows tie on the same latest timestamp within a bucket the
    struct-max picks the greatest by value (the unbucketed window form
    is sort-order-unstable on such ties; both are arbitrary).
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
    # width in unix micros — NOT derived via timestamp-literal interval
    # arithmetic, which would silently shift by the session timezone
    bucket_us = F.lit(int(bucket_s * 1_000_000))

    l_tagged = (
        left.withColumn("__t", F.col(left_time).cast("timestamp"))
        .withColumn("__is_l", F.lit(1))
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
    l_tagged = l_tagged.withColumn(
        "__bkt", F.floor(F.unix_micros("__t") / bucket_us)
    )
    r_tagged = r_tagged.withColumn(
        "__bkt", F.floor(F.unix_micros("__t") / bucket_us)
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # pass 1: in-bucket carry (right rows sort before left at one instant)
    w = (
        W.partitionBy(on, "__bkt")
        .orderBy(F.col("__t"), F.col("__is_l"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = unioned
    for c in value_cols:
        carried = carried.withColumn(
            f"__in_{c}",
            F.last(F.when(F.col("__is_l") == 0, F.col(c)), ignorenulls=True).over(w),
        )
    carried = carried.withColumn(
        "__in_t",
        F.last(F.when(F.col("__is_l") == 0, F.col("__t")), ignorenulls=True).over(w),
    )

    # pass 2: per-(key, bucket) latest right row, carried across buckets.
    # The frame is one row per (key, bucket) — the hot key contributes
    # #buckets rows here, not its data volume.
    last_in_bucket = r_tagged.groupBy(on, "__bkt").agg(
        F.max(
            F.struct(F.col("__t").alias("t"), *[F.col(c).alias(c) for c in value_cols])
        ).alias("__m")
    )
    all_buckets = unioned.select(on, "__bkt").distinct()
    wb = (
        W.partitionBy(on)
        .orderBy("__bkt")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carry_in = (
        all_buckets.join(last_in_bucket, [on, "__bkt"], "left")
        .withColumn("__carry", F.last("__m", ignorenulls=True).over(wb))
        .select(on, "__bkt", "__carry")
    )

    out = (
        carried.where(F.col("__is_l") == 1)
        .join(carry_in, [on, "__bkt"], "left")
    )
    asof_t = F.coalesce(F.col("__in_t"), F.col("__carry.t"))
    vals = {
        c: F.coalesce(F.col(f"__in_{c}"), F.col(f"__carry.{c}")) for c in value_cols
    }
    if tolerance is not None:
        within = asof_t >= F.col("__t") - F.expr(f"INTERVAL {tolerance}")
        vals = {c: F.when(within, v) for c, v in vals.items()}
    keep = [F.col(c) for c in left.columns] + [
        vals[c].alias(c) for c in value_cols
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
