"""Deduplication operators (SURVEY §2.3).

Reference semantics re-expressed set-oriented:

* D1 content-hash dedup  — grove/connectors/__init__.py:590-671: drop an
  entry when its (pointer, md5-of-canonical-JSON) pair was seen in the
  previous run's boundary state. State is bounded: only hashes sharing
  the LATEST pointer value are kept (:634-637).
* D2/D3 pointer dedup    — :695-754: in Spark the sequential
  walk-until-pointer becomes an exact watermark predicate; the
  "prefer duplicates over loss" fallback (:717-722) is unreachable
  because the predicate is exact, not positional (documented, tested).

At 100 TB: the seen-hash table is tiny (one boundary pointer's worth of
hashes per connector) -> broadcast anti-join, no shuffle of the big side.
The watermark predicate is a pushed-down parquet/Iceberg filter.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grove_spark.functions.hashing import entry_hash


def dedup_within_batch(
    df: DataFrame, hash_cols: Sequence[str], algo: str = "xxhash64"
) -> DataFrame:
    """Exact dedup inside one collection: first row per content hash.

    Default hash is xxhash64 over the raw columns — JVM-native, no JSON
    string materialization (hashing a 2 KB token array via md5(to_json(…))
    costs ~10× more CPU). ``algo="md5_json"`` gives byte parity with the
    reference's hash_entry when the seen-state must interoperate."""
    h = entry_hash(hash_cols) if algo == "md5_json" else F.xxhash64(*hash_cols)
    return df.withColumn("__h", h).dropDuplicates(["__h"]).drop("__h")


def dedup_by_hash(
    df: DataFrame,
    seen: DataFrame,
    hash_cols: Sequence[str],
    pointer_col: str,
) -> DataFrame:
    """Anti-join against the persisted seen-hash state (D1).

    ``seen`` has columns (pointer string, hash string) and is small by
    construction (boundary pointer only) -> broadcast anti-join.
    """
    hashed = df.withColumn("__h", entry_hash(hash_cols)).withColumn(
        "__p", F.col(pointer_col).cast("string")
    )
    seen2 = F.broadcast(
        seen.select(
            F.col("pointer").cast("string").alias("__p"),
            F.col("hash").alias("__h"),
        )
    )
    return hashed.join(seen2, ["__p", "__h"], "left_anti").drop("__p", "__h")


def boundary_hashes(df: DataFrame, hash_cols: Sequence[str], pointer_col: str) -> DataFrame:
    """New seen-hash state: hashes of entries sharing the max pointer value
    (the bounded-state rule, reference :634-637 / hash_entries :604-625)."""
    hashed = df.select(
        F.col(pointer_col).cast("string").alias("pointer"),
        entry_hash(hash_cols).alias("hash"),
    )
    mx = hashed.agg(F.max("pointer").alias("pointer"))
    return hashed.join(F.broadcast(mx), "pointer", "inner").distinct()


def dedup_by_pointer(
    df: DataFrame,
    pointer_col: str,
    pointer: str | None,
    log_order: str = "CHRONOLOGICAL",
) -> DataFrame:
    """Incremental watermark filter (D2/D3).

    Chronological: keep rows strictly after the stored pointer.
    Reverse-chronological sources have no scan-order constraint in Spark;
    the same exact predicate applies. When no pointer exists yet (first
    run) everything is kept.
    """
    if pointer is None:
        return df
    return df.where(F.col(pointer_col).cast("string") > F.lit(str(pointer)))
