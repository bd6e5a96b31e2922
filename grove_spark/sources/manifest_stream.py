"""Structured-Streaming reads over the manifested store: manifest
versions as streaming offsets — the streaming twin of
``incremental_append_scan`` (Iceberg's ``readStream`` on a table).

Reference parity: grove's connectors poll a source and commit one
pointer per run (`/root/reference/grove/connectors/base.py` run loop,
pointer save at base.py:~300); a downstream consumer tails the saved
output. This source turns the committed store ITSELF into a streaming
source with exactly-once offsets:

* offset = the manifest root version (one integer — the same
  checkpoint ``incremental_paths`` hands a batch consumer),
* a micro-batch = the data dirs APPENDED in ``(start, end]``,
* one ``InputPartition`` per parquet FILE, read executor-side via
  Arrow — the driver handles only version integers and file lists,
  never row bytes, so a 100 TB backlog plans in milliseconds and
  replays at executor parallelism.

Rewrite snapshots follow the ``incremental_paths`` contract
(state/runstate.py:1054): compaction commits are data-neutral and
skipped; MERGE commits are history-changing and fail the stream loudly
unless ``ignore_mutations=true`` (Iceberg's streaming read refusing
replace snapshots). Retention is the reader barrier: an appended dir
reclaimed before the stream consumed it raises rather than silently
dropping rows.

Partition-column typing: hive components (``descriptor`` / ``connector``
/ ``date``) ride in the file PATH, not the footer. With an explicit
``.schema(...)`` they are cast to the declared types; the derived
default schema types them as strings (documented, deterministic).

Trigger caveat: Spark's Python micro-batch sources do not support
Trigger.AvailableNow — it falls back to "single batch execution" (one
micro-batch per start). For one-shot complete drains (especially with
``max_versions_per_batch`` set, which bounds what a single batch
admits) use ``drain_manifest_stream``, which loops starts against one
checkpoint until the committed offset reaches the store version.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


class _FileSlice(InputPartition):
    """One parquet file plus the hive partition values encoded in its
    path. ``path == ''`` is the planned-empty sentinel (Spark requires a
    non-empty partition list per batch)."""

    def __init__(self, path: str, parts: List[Tuple[str, Optional[str]]]):
        self.path = path
        self.parts = parts


def _hive_parts(base: str, file_path: str) -> List[Tuple[str, Optional[str]]]:
    """``k=v`` components of ``dirname(file_path)`` relative to ``base``,
    URL-unescaped, hive null sentinel mapped to None."""
    rel = os.path.relpath(os.path.dirname(file_path), base)
    out: List[Tuple[str, Optional[str]]] = []
    for comp in rel.split(os.sep):
        if "=" not in comp:
            continue
        k, _, v = comp.partition("=")
        v = unquote(v)
        out.append((k, None if v == _HIVE_NULL else v))
    return out


def _typed_scalar(raw: Optional[str], dtype):
    """Parse one hive partition string into a python scalar matching the
    declared arrow type (the cast happens ONCE per file, not per row)."""
    import datetime as dt

    import pyarrow as pa

    if raw is None:
        return None
    if pa.types.is_date(dtype):
        return dt.date.fromisoformat(raw)
    if pa.types.is_timestamp(dtype):
        return dt.datetime.fromisoformat(raw)
    if pa.types.is_integer(dtype):
        return int(raw)
    if pa.types.is_floating(dtype):
        return float(raw)
    if pa.types.is_boolean(dtype):
        return raw.lower() in ("true", "1")
    return raw


class _ManifestStreamReader(DataSourceStreamReader):
    """Micro-batch planner over the manifest. Driver-side methods load
    the (tiny JSON) manifest; ``read`` runs on executors and touches
    only its one parquet file."""

    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.root = options["state_dir"]
        self.ignore_mutations = (
            str(options.get("ignore_mutations", "false")).lower() == "true"
        )
        # 0 = unbounded. latestOffset() seeds the cap floor from
        # start_version on first use (so even batch 1 of a cold start is
        # capped); partitions()/commit() re-learn the true position
        # afterwards — on a checkpoint restart Spark replays commit()
        # for the recovered batch before planning, which re-seeds the
        # floor from the checkpoint.
        self.max_versions = int(options.get("max_versions_per_batch", 0))
        self.start_version = int(options.get("start_version", 0))
        self._floor: Optional[int] = None

    # -- driver side ---------------------------------------------------
    def _state(self):
        from grove_spark.state.runstate import RunState

        return RunState(self.root)

    def initialOffset(self) -> dict:
        # only called on a COLD start (no checkpoint); latestOffset()
        # seeds the same floor itself because Spark does not reliably
        # call initialOffset on the serving instance first.
        self._floor = self.start_version
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        cur = self._state().version()
        if self.max_versions:
            if self._floor is None:
                # Spark does NOT reliably call initialOffset() on this
                # instance before the first latestOffset() (observed),
                # and the first batch after a cold start is exactly the
                # backlog the cap exists to bound — seed the floor from
                # start_version rather than leaving batch 1 uncapped.
                # After a checkpoint restart the real position may be
                # ahead of start_version; partitions() re-learns it from
                # the start offset Spark passes (one low batch replans
                # an already-consumed empty window, then pacing resumes
                # from the true position).
                self._floor = self.start_version
            cur = min(cur, self._floor + self.max_versions)
        return {"version": cur}

    def partitions(self, start: dict, end: dict) -> List[_FileSlice]:
        from grove_spark.sources.file_stats import _list_parquet

        lo, hi = int(start["version"]), int(end["version"])
        # next latestOffset advances from here; max(lo, ...) re-learns
        # the true position after a checkpoint restart whose offset is
        # ahead of the seeded start_version floor
        self._floor = max(lo, hi, self._floor or 0)
        if hi < lo:
            # A REGRESSED window would commit a backwards offset and the
            # following batch would replay already-delivered versions —
            # silent duplication. Unreachable on current Spark (recovery
            # replays commit() before planning, which re-seeds the
            # floor), so if it ever fires, fail LOUDLY; the floor update
            # above means a retried plan resumes from `lo` correctly.
            raise ValueError(
                f"planned end offset {hi} is below start {lo} — the "
                "pacing floor was lost across a restart; restart the "
                "query (the checkpoint is intact and the next plan "
                "resumes from the committed position)."
            )
        if hi == lo:
            return [_FileSlice("", [])]  # empty window
        info = self._state().incremental_paths(lo, as_of=hi)
        if info["mutations"] and not self.ignore_mutations:
            raise ValueError(
                f"versions ({lo}, {hi}] contain history-changing merge "
                f"commits {info['mutations']} — a streaming append read "
                "cannot reflect upserts/deletes. Re-read the store "
                "(manifest_scan) or set ignore_mutations=true to consume "
                "only the appends."
            )
        out: List[_FileSlice] = []
        for d in info["appended"]:
            if not os.path.isdir(d):
                raise ValueError(
                    f"appended dir expired before the stream consumed it: "
                    f"{d} — retention (expire_runs) is the reader barrier; "
                    "keep the stream ahead of it."
                )
            for f in _list_parquet(d):
                out.append(_FileSlice(f, _hive_parts(d, f)))
        return out or [_FileSlice("", [])]

    def commit(self, end: dict) -> None:
        self._floor = max(self._floor or 0, int(end["version"]))

    # -- executor side ---------------------------------------------------
    def read(self, partition: _FileSlice) -> Iterator:
        if not partition.path:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self.schema)
        part_vals = dict(partition.parts)
        # ONE footer read per file (schema + row groups from the same
        # ParquetFile) — on object storage a second read_schema would
        # double the per-file metadata GETs across a backlog replay
        pf = pq.ParquetFile(partition.path)
        footer_cols = set(pf.schema_arrow.names)
        # column pruning: only footer columns the declared schema wants
        want = [f.name for f in target if f.name in footer_cols]
        for batch in pf.iter_batches(batch_size=1 << 16, columns=want):
            n = batch.num_rows
            cols = []
            for field in target:
                if field.name in footer_cols:
                    col = batch.column(field.name)
                    if col.type != field.type:
                        col = col.cast(field.type)
                elif field.name in part_vals:
                    v = _typed_scalar(part_vals[field.name], field.type)
                    col = (
                        pa.nulls(n, field.type)
                        if v is None
                        else pa.repeat(pa.scalar(v, field.type), n)
                    )
                else:
                    col = pa.nulls(n, field.type)
                cols.append(col)
            yield pa.RecordBatch.from_arrays(cols, schema=target)


class ManifestStreamDataSource(DataSource):
    """``spark.readStream.format("grove_manifest_stream")`` over a
    RunState store. Options: ``state_dir`` (required), ``start_version``,
    ``max_versions_per_batch``, ``ignore_mutations``."""

    @classmethod
    def name(cls) -> str:
        return "grove_manifest_stream"

    def schema(self):
        """Derived default: one committed footer + hive partition columns
        AS STRINGS. Pass an explicit ``.schema(...)`` to type the
        partition columns (date etc.)."""
        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import StringType, StructField

        import pyarrow.parquet as pq

        from grove_spark.sources.file_stats import _list_parquet
        from grove_spark.state.runstate import RunState

        state = RunState(self.options["state_dir"])
        for d in state.committed_paths():
            files = _list_parquet(d)
            if files:
                base = from_arrow_schema(pq.read_schema(files[0]))
                footer_names = {f.name for f in base.fields}
                part_fields = [
                    StructField(k, StringType())
                    for k, _ in _hive_parts(d, files[0])
                    if k not in footer_names
                ]
                return StructType(list(base.fields) + part_fields)
        raise ValueError(
            "manifest has no committed parquet to derive a schema from — "
            "pass an explicit .schema(...) to readStream."
        )

    def streamReader(self, schema: StructType):
        return _ManifestStreamReader(schema, self.options)


def read_manifest_stream(
    spark: SparkSession,
    state_dir: str,
    schema: Optional[StructType] = None,
    **options,
) -> DataFrame:
    """Front door: register the source and open the stream. ``options``
    pass through (``start_version=``, ``max_versions_per_batch=``,
    ``ignore_mutations=``)."""
    spark.dataSource.register(ManifestStreamDataSource)
    r = spark.readStream.format("grove_manifest_stream").option(
        "state_dir", state_dir
    )
    for k, v in options.items():
        r = r.option(k, str(v).lower() if isinstance(v, bool) else str(v))
    if schema is not None:
        r = r.schema(schema)
    return r.load()


def _committed_version(checkpoint: str) -> Optional[int]:
    """The manifest version of the last COMMITTED micro-batch in a
    stream checkpoint (offsets file of the highest batch id present in
    commits/), or None before any batch committed."""
    import glob
    import json

    commits = [
        int(os.path.basename(p))
        for p in glob.glob(os.path.join(checkpoint, "commits", "*"))
        if os.path.basename(p).isdigit()
    ]
    if not commits:
        return None
    off = os.path.join(checkpoint, "offsets", str(max(commits)))
    with open(off) as f:
        last = f.read().strip().splitlines()[-1]
    return int(json.loads(last)["version"])


def drain_manifest_stream(
    spark: SparkSession,
    state_dir: str,
    configure,
    checkpoint: str,
    schema: Optional[StructType] = None,
    max_runs: int = 10_000,
    **options,
) -> dict:
    """Drain the store COMPLETELY through repeated single-batch runs —
    the reliable replacement for one ``availableNow`` start.

    Spark's Python micro-batch sources do not support
    Trigger.AvailableNow; it falls back to "single batch execution",
    which (a) reads at most one micro-batch per start — so a
    ``max_versions_per_batch`` cap would silently stop early — and
    (b) after a crash between the offset-log write and the batch commit,
    replays only the stale batch and exits cleanly with newer commits
    unread. This helper loops starts against ONE checkpoint until the
    checkpoint's committed offset reaches the manifest version observed
    at entry, so every committed row is delivered exactly once no matter
    how many crashes or how small the pacing cap.

    ``configure(df) -> DataStreamWriter`` picks the sink/output mode;
    the checkpoint location and trigger are owned here. Returns
    {"runs": n, "version": v}.
    """
    from grove_spark.state.runstate import RunState

    target = RunState(state_dir).version()
    runs = 0
    while True:
        df = read_manifest_stream(spark, state_dir, schema=schema, **options)
        q = (
            configure(df)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        runs += 1
        v = _committed_version(checkpoint) or 0
        if v >= target:
            return {"runs": runs, "version": v}
        if runs >= max_runs:
            raise RuntimeError(
                f"drain did not reach manifest version {target} after "
                f"{runs} runs (checkpoint at {v}) — is the store being "
                "appended faster than the pacing cap admits?"
            )
