"""Copy-on-write MERGE over committed run outputs — the Iceberg
``MERGE INTO`` analog for the run-state manifest.

A log pipeline at 100 TB needs more than append: late corrections
(re-delivered events with fixed fields), upstream re-crawls that
supersede earlier document versions, and key-targeted deletion (the
right-to-be-forgotten path for a training-data store). All three are
one primitive: rewrite the rows whose merge key matches an update,
keep everything else byte-identical, and swap atomically.

The shape is copy-on-write at RUN-DIR granularity, reusing the
compaction rewrite-record protocol (operators/compaction.py — same
``data_paths`` + ``replaces`` atomic swap, same reader contract):

* **prune first** — per-dir [min, max] of the first merge-key column
  come from parquet FOOTERS (metadata only); a broadcast interval join
  of the update keys against those ranges finds the dirs that can
  possibly contain a match. Dirs whose key range cannot overlap any
  update key are never read, never rewritten — on a range-clustered
  store a small correction batch touches a handful of dirs out of
  thousands. Stat-less dirs are kept conservatively (pruning changes
  cost, never results).
* **rewrite only those** — matched target rows are dropped via a
  single anti-join (updates broadcast by default — a correction batch
  is dim-sized); surviving rows plus the update rows (upsert) land in
  ONE new ``part-merge-<run_id>`` dir through the judged partitioned
  writer, so hive layout and footer stats keep working.
* **swap atomically** — the commit is CONDITIONAL on the manifest
  version read at the start (``expected_version``): a concurrent
  commit between snapshot and publish raises ConcurrentCommitError
  instead of silently merging against a stale snapshot. Readers see
  the old dirs or the new one, never both (RunState's contract);
  superseded dirs linger until ``expire_runs``.

Source-key uniqueness is enforced loudly (one aggregate): two update
rows sharing a merge key would make the rewrite nondeterministic —
the same error contract as Delta/Iceberg's
"multiple source rows matched".

Row accounting is footer-derived, not an extra job: matched/inserted/
deleted counts come from manifest row counts before vs after plus the
update count the uniqueness check already paid for.

Reference parity: Grove has no in-place mutation — its outputs are
append-only objects (grove/outputs/aws_s3.py) and corrections arrive
as re-collected runs deduplicated downstream (grove/connectors/
__init__.py pointer+hash dedup). This operator is the lakehouse-side
completion of that story: the dedup decides which version wins, MERGE
materializes the decision into the committed store.
"""

from __future__ import annotations

import os
from functools import reduce
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grove_spark.state.runstate import RunState


def _dir_key_ranges(dirs: Sequence[str], key_col: str, cache=None) -> dict:
    """{dir: {"min", "max", "rows"}} for the first merge-key column,
    from parquet footers only. A dir with any stat-less file maps to
    min=max=None (must be treated as affected). ``cache`` is a
    FileStatsCache: footers of immutable files are then read ONCE per
    store lifetime, not once per merge (the O(new-files) cost model)."""
    from grove_spark.sources.file_stats import _list_parquet, parquet_file_stats

    out = {}
    for d in dirs:
        if cache is not None:
            stats = cache.stats_for(d, key_col)
        else:
            files = _list_parquet(d)
            stats = parquet_file_stats(files, key_col) if files else {}
        lo = hi = None
        rows = 0
        complete = True
        for ent in stats.values():
            rows += ent.get("rows") or 0
            if ent.get("min") is None or ent.get("max") is None:
                complete = False
                continue
            lo = ent["min"] if lo is None else min(lo, ent["min"])
            hi = ent["max"] if hi is None else max(hi, ent["max"])
        if not complete:
            lo = hi = None
        out[d] = {"min": lo, "max": hi, "rows": rows}
    return out


def merge_into(
    spark: SparkSession,
    state: RunState,
    out_path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    when_matched: str = "update",
    pointer_col: str = "event_time",
    connector_key: str = "fleet",
    broadcast_updates: bool = True,
    max_records_per_file: int = 1_000_000,
    run_id: Optional[str] = None,
    bloom_fpr: Optional[float] = None,
    bloom_probe_max_keys: int = 2_000_000,
    stats_cache=None,
) -> Optional[dict]:
    """Copy-on-write MERGE of ``updates`` into the committed store under
    ``out_path``. See the module docstring for the full contract.

    ``when_matched="update"`` upserts: matched target rows are replaced
    by their update row, unmatched update rows are inserted (the
    update frame must carry the full store schema). ``"delete"``
    removes matched rows; the update frame only needs ``key_cols``.
    Returns the merge metrics dict, or None for a no-op delete.

    ``run_id`` pins the commit's identity — streaming callers pass a
    deterministic per-epoch id so a replayed micro-batch can be
    recognized via ``state.is_committed`` (streaming/stream.py
    merge_sink); batch callers leave it None for a fresh id.

    Bloom pruning (sources/bloom.py): dirs that survive range pruning
    but carry a ``_key_bloom_<col>.bin`` sidecar are point-probed with
    the update keys' hashes — the pruner for stores NOT clustered by
    the merge key, where every dir's range spans the domain. The probe
    collects one (h1, h2) pair per distinct update key, so it is
    skipped (with the dirs kept) past ``bloom_probe_max_keys``.
    ``bloom_fpr`` builds the sidecar on the REWRITTEN dir; when None,
    a sidecar is still rebuilt if any replaced dir had one (the store's
    bloom coverage never silently decays through a merge).

    Duplicate TARGET rows (re-delivered appends not yet deduped): every
    target copy of a matched key is superseded by its single update row
    — the merge CONVERGES the store. The accounting stays exact:
    ``rows_updated`` counts matched update keys, ``rows_superseded``
    the target rows removed, and ``duplicates_collapsed`` their
    difference. (Delta/Iceberg instead fail on multiple target matches;
    this store allows duplicate appends by design, so convergence is
    the correct semantic here — documented deviation.)

    ``stats_cache`` (sources/file_stats.FileStatsCache) makes the
    range-pruning footer reads incremental across merges: immutable
    files are read once per store lifetime, not once per call.

    The updates frame is persisted for the duration of the call — it is
    evaluated several times (uniqueness agg, pruning joins, the final
    rewrite); a nondeterministic source would otherwise defeat the
    uniqueness contract between evaluations.
    """
    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be 'update' or 'delete', got {when_matched!r}")
    key_cols = list(key_cols)
    if not key_cols:
        raise ValueError("key_cols must name at least one column")

    # evaluated several times below (uniqueness agg, pruning joins,
    # matched-key count, rewrite) — pin ONE evaluation. Spark caching is
    # not refcounted, so only persist (and later unpersist) when the
    # caller has NOT already cached the frame: an unconditional inner
    # persist/unpersist pair would silently drop a caller-side persist,
    # and a caller persist at a non-default level would make the inner
    # persist() raise "cannot change storage level".
    own_persist = not updates.storageLevel.useMemory and not (
        updates.storageLevel.useDisk
    )
    if own_persist:
        updates = updates.persist()
    try:
        return _merge_run(
            spark, state, out_path, updates, key_cols, when_matched,
            pointer_col, connector_key, broadcast_updates,
            max_records_per_file, run_id, bloom_fpr,
            bloom_probe_max_keys, stats_cache,
        )
    finally:
        if own_persist:
            updates.unpersist()


def _merge_run(
    spark, state, out_path, updates, key_cols, when_matched,
    pointer_col, connector_key, broadcast_updates,
    max_records_per_file, run_id, bloom_fpr,
    bloom_probe_max_keys, stats_cache,
) -> Optional[dict]:
    from grove_spark.operators.sinks import write_partitioned_parquet
    from grove_spark.sources.file_stats import _list_parquet, parquet_file_stats

    base_version = state.version()
    root = os.path.normpath(out_path)
    store_dirs = [
        d for d in state.committed_paths()
        if os.path.normpath(d).startswith(root + os.sep)
    ]

    # ---- source-key uniqueness (the Delta/Iceberg loud contract) ----
    null_key = reduce(
        lambda a, b: a | b, [F.col(k).isNull() for k in key_cols]
    )
    agg = updates.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(*[F.col(k) for k in key_cols]).alias("nd"),
        F.sum(null_key.cast("int")).alias("nn"),
    ).first()
    n_updates, n_distinct = agg["n"], agg["nd"]
    if agg["nn"]:
        raise ValueError(
            f"{agg['nn']} update rows have a NULL merge key on {key_cols} "
            "— a null key can never match a target row (anti-join "
            "semantics); filter or fill them first."
        )
    if n_updates != n_distinct:
        raise ValueError(
            f"{n_updates - n_distinct} update rows share a merge key on "
            f"{key_cols} — MERGE requires source keys to be unique "
            "(nondeterministic otherwise); pre-aggregate the updates."
        )
    if n_updates == 0:
        return None

    # ---- prune: which committed dirs can contain a matched key? ----
    ranges = _dir_key_ranges(store_dirs, key_cols[0], cache=stats_cache)
    statless = [d for d, r in ranges.items() if r["min"] is None]
    ranged = [(d, r["min"], r["max"]) for d, r in ranges.items() if r["min"] is not None]
    affected = set(statless)
    if ranged:
        from pyspark.sql import types as T

        kdt = updates.schema[key_cols[0]].dataType
        # Driver-side range check for small int/string key sets: the
        # distributed interval join paid a whole Spark job (broadcast
        # build + AQE stages) to compare a dim-sized key list against a
        # handful of [lo, hi] pairs. One narrow distinct-collect +
        # bisect does the identical comparison (int order and Python
        # str order both match Spark's — UTF-8 byte order preserves
        # code points). Other key types (timestamps, decimals) keep the
        # distributed join: their driver-side comparison semantics are
        # not provably identical, and pruning must never be wrong.
        driver_pruned = False
        if n_updates <= bloom_probe_max_keys and isinstance(
            kdt,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.StringType),
        ):
            import bisect

            kvals = sorted(
                r[0] for r in updates.select(key_cols[0]).distinct().collect()
            )
            try:
                hit = set()
                for d, lo, hi in ranged:
                    i = bisect.bisect_left(kvals, lo)
                    if i < len(kvals) and kvals[i] <= hi:
                        hit.add(d)
                affected.update(hit)
                driver_pruned = True
            except TypeError:
                # a schema-evolved store whose footer stats are not the
                # update key's type (e.g. int updates vs a string dir):
                # fall through to the distributed join, which coerces
                pass
        if not driver_pruned:
            rdf = spark.createDataFrame(ranged, ["__dir", "__lo", "__hi"])
            k = F.col(key_cols[0])
            hits = (
                updates.select(key_cols[0])
                .join(
                    F.broadcast(rdf),
                    (k >= F.col("__lo")) & (k <= F.col("__hi")),
                    "inner",
                )
                .select("__dir")
                .distinct()
                .collect()
            )
            affected.update(r["__dir"] for r in hits)

    # ---- bloom refinement: point-probe dirs that ranges kept ----
    if affected and n_updates <= bloom_probe_max_keys:
        from grove_spark.sources.bloom import (
            _hash_cols,
            load_bloom,
            probe_dirs,
            probe_dirs_distributed,
        )

        cand = sorted(affected)
        # small sets: peek for sidecars first and skip the key-hash
        # collect when there are none. Large sets: go straight to the
        # distributed probe (it keeps sidecar-less dirs, and a driver
        # peek over 100k dirs is the cost we're avoiding).
        if len(cand) > 256 or any(
            load_bloom(d, key_cols[0]) is not None for d in cand
        ):
            # xxhash64 is TYPE-sensitive (int 10 and bigint 10 hash
            # differently): cast the probe keys to each dir's OWN key
            # type so they hash exactly like that dir's sidecar build
            # did. Dirs are grouped by footer key type (one pyarrow
            # footer read per dir — metadata only); a single-type store
            # pays one hash collect exactly as before, a schema-evolved
            # store pays one per distinct type instead of silently
            # probing every sidecar with cand[0]'s type (false
            # negatives -> missed updates).
            import pyarrow.parquet as _pq

            from grove_spark.sources.file_stats import (
                _list_parquet as _lsp,
            )

            def _dir_ktype(d):
                files = _lsp(d)
                if not files:
                    return None
                try:
                    f = _pq.read_schema(files[0]).field(key_cols[0])
                except KeyError:
                    return None
                return f.type

            by_type: dict = {}
            for d in cand:
                by_type.setdefault(str(_dir_ktype(d)), []).append(d)
            kept_bloom = set()
            for tstr, dirs in by_type.items():
                if tstr == "None":
                    kept_bloom.update(dirs)  # unreadable: keep conservatively
                    continue
                ktype = spark.read.parquet(dirs[0]).schema[key_cols[0]].dataType
                hashed = (
                    updates.select(
                        F.col(key_cols[0]).cast(ktype).alias(key_cols[0])
                    )
                    .select(*_hash_cols(key_cols[0]))
                    .distinct()
                    .toPandas()
                )
                h1 = hashed["__h1"].to_numpy()
                h2 = hashed["__h2"].to_numpy()
                if len(dirs) > 256:
                    # executor-side sidecar reads: the driver collects one
                    # boolean per dir instead of O(dirs x sidecar bytes)
                    verdict = probe_dirs_distributed(
                        spark, dirs, key_cols[0], h1, h2
                    )
                else:
                    verdict = probe_dirs(dirs, key_cols[0], h1, h2)
                kept_bloom.update(d for d in dirs if verdict[d])
            affected = kept_bloom
    affected_dirs = sorted(affected)
    rows_before = sum(ranges[d]["rows"] for d in affected_dirs)

    if not affected_dirs and when_matched == "delete":
        return None  # nothing can match; nothing to rewrite

    # ---- rewrite: anti-join survivors, union the upserts ----
    upd_keys = updates.select(*key_cols)
    if broadcast_updates:
        upd_keys = F.broadcast(upd_keys)
    frames = [
        spark.read.option("basePath", d).parquet(d) for d in affected_dirs
    ]
    matched_keys = 0
    if frames:
        target = reduce(lambda a, b: a.unionByName(b), frames)
        if "date" in target.columns:  # the writer re-derives it
            target = target.drop("date")
        if when_matched == "update":
            # exact per-update-key accounting even when the store holds
            # duplicate rows for a key (re-delivered appends): one
            # broadcast semi-join count over the PRUNED dirs
            matched_keys = (
                updates.select(*key_cols)
                .join(target.select(*key_cols), key_cols, "left_semi")
                .count()
            )
        preserved = target.join(upd_keys, key_cols, "left_anti")
    else:
        preserved = None
    if when_matched == "update":
        new_df = updates if preserved is None else preserved.unionByName(updates)
    else:
        new_df = preserved

    run_id = run_id or state.new_run_id()
    new_dir = os.path.normpath(f"{out_path}/part-merge-{run_id}")
    state.register_pending(new_dir)  # orphan GC must not race the write
    # REBALANCE before the dynamic-partition write (guide §6): new_df is
    # a union of per-dir scan splits plus the (often many-partitioned)
    # update frame — written directly, every tiny task opens its own
    # zstd parquet writers per touched hive dir (measured 7.1 s for a
    # 250k-row rewrite, ~100 near-empty files). The AQE rebalance
    # shuffle sizes write tasks to advisoryPartitionSizeInBytes, so the
    # rewritten dir comes out in few well-sized files. Row content is
    # untouched; only file layout changes.
    write_partitioned_parquet(
        new_df.hint("rebalance"), new_dir,
        max_records_per_file=max_records_per_file,
    )
    out_files = _list_parquet(new_dir)
    out_stats = parquet_file_stats(out_files, pointer_col)
    rows_after = sum(e["rows"] for e in out_stats.values())

    if not out_files:
        # a purge emptied every affected dir: publish the removal with
        # NO data path — committing a parquet-less dir would poison
        # every later basePath read (UNABLE_TO_INFER_SCHEMA) in merges
        # and manifest scans
        import shutil

        shutil.rmtree(new_dir, ignore_errors=True)
        state._clear_pending([new_dir])
        data_paths, new_dir = [], None
    else:
        data_paths = [new_dir]

    # bloom coverage never silently decays: rebuild the sidecar when
    # asked, or when any replaced dir carried one
    bloom_built = None
    if out_files:
        from grove_spark.sources.bloom import build_key_bloom, load_bloom

        want = bloom_fpr is not None or any(
            load_bloom(d, key_cols[0]) is not None for d in affected_dirs
        )
        if want:
            # default 1e-6: the dir-level probe asks "any of K keys
            # here?", so per-key fpr must stay well under 1/K — see
            # sources/bloom.py's sizing note
            bloom_built = build_key_bloom(
                spark, new_dir, key_cols[0], fpr=bloom_fpr or 1e-6
            )

    if when_matched == "update":
        preserved_rows = rows_after - n_updates
        superseded = rows_before - preserved_rows
        metrics = {
            "rows_updated": matched_keys,
            "rows_inserted": n_updates - matched_keys,
            "rows_superseded": superseded,
            "duplicates_collapsed": superseded - matched_keys,
            "rows_deleted": 0,
            "rows_preserved": preserved_rows,
        }
    else:
        metrics = {
            "rows_updated": 0,
            "rows_inserted": 0,
            "rows_superseded": rows_before - rows_after,
            "duplicates_collapsed": 0,
            "rows_deleted": rows_before - rows_after,
            "rows_preserved": rows_after,
        }
    metrics.update(
        dirs_total=len(store_dirs),
        dirs_rewritten=len(affected_dirs),
        bloom_sidecar=bool(bloom_built),
    )

    state.commit(
        f"__merge__.{connector_key}", run_id,
        metrics={"merge": metrics},
        data_paths=data_paths,
        file_stats=out_stats,
        replaces=affected_dirs,
        rewrite_kind="mutation",  # history changed: incremental readers must not skip
        expected_version=base_version,  # snapshot-isolated CoW
    )
    return {"run_id": run_id, "new_dir": new_dir, "replaced": affected_dirs, **metrics}


def delete_by_keys(
    spark: SparkSession,
    state: RunState,
    out_path: str,
    keys: DataFrame,
    key_cols: Sequence[str],
    **kwargs,
) -> Optional[dict]:
    """Key-targeted deletion from the committed store — the
    right-to-be-forgotten path. Sugar for ``merge_into(...,
    when_matched="delete")``: only the dirs whose key range can contain
    a requested key are rewritten; the swap is one atomic conditional
    commit."""
    return merge_into(
        spark, state, out_path, keys, key_cols,
        when_matched="delete", **kwargs,
    )
