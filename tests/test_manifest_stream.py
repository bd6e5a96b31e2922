"""Streaming reads over the manifested store
(sources/manifest_stream.py): manifest versions as streaming offsets,
exactly-once across checkpoint restarts, the incremental-read rewrite
contract (compactions skipped, mutations loud), and the version-cap
pacing logic."""

import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from grove_spark.operators.compaction import compact_runs
from grove_spark.operators.merge import merge_into
from grove_spark.sources.manifest_stream import (
    _ManifestStreamReader,
    read_manifest_stream,
)
from test_incremental import _append
from test_merge import SCHEMA, _rows, _store

TYPED = StructType(
    list(SCHEMA.fields) + [StructField("date", DateType())]
)


def _drain(stream, name, checkpoint=None):
    """availableNow drain to a memory sink; returns the sink table name."""
    w = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    q = w.start()
    q.awaitTermination()
    return name


def test_stream_matches_batch_and_types_partitions(spark, tmp_path):
    state, out = _store(spark, tmp_path)  # 200 rows across 2 commits
    stream = read_manifest_stream(spark, str(tmp_path / "state"), schema=TYPED)
    t = spark.table(_drain(stream, "ms_full"))
    assert t.count() == 200
    assert dict(t.dtypes)["date"] == "date"  # explicit schema casts hive parts
    # row-level parity with the batch read
    from grove_spark.sources.scans import manifest_scan

    batch = manifest_scan(spark, state, pointer_col="event_time")
    assert (
        t.select(*batch.columns).exceptAll(batch).count() == 0
        and batch.exceptAll(t.select(*batch.columns)).count() == 0
    )


def test_checkpoint_restart_reads_only_new_commits(spark, tmp_path):
    """Exactly-once across restarts with the fault-tolerant file sink:
    the offset (manifest version) lives in the checkpoint; each restart
    consumes only commits it hasn't seen."""
    state, out = _store(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def run_once():
        stream = read_manifest_stream(
            spark, str(tmp_path / "state"), schema=TYPED
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink)

    assert run_once().count() == 200

    _append(spark, state, out, range(500, 560), typ="later")
    t2 = run_once()
    # run 2 appended exactly the 60 new rows — no replay of run 1's data
    assert t2.count() == 260
    assert t2.where(F.col("event_type") == "later").count() == 60
    assert t2.select("event_id").distinct().count() == 260

    # nothing new: a third run appends zero rows
    assert run_once().count() == 260


def test_compaction_in_window_not_double_read(spark, tmp_path):
    state, out = _store(spark, tmp_path)
    res = compact_runs(
        spark, state, out, pointer_col="event_time", small_file_bytes=1 << 30
    )
    assert res is not None
    stream = read_manifest_stream(spark, str(tmp_path / "state"), schema=TYPED)
    t = spark.table(_drain(stream, "ms_compact"))
    assert t.count() == 200  # original appends once; compacted copy skipped
    assert t.select("event_id").distinct().count() == 200


def test_mutation_fails_stream_unless_acknowledged(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    state, out = _store(spark, tmp_path)
    upd = spark.createDataFrame(_rows([150], "patched"), SCHEMA)
    merge_into(spark, state, out, upd, ["event_id"])
    _append(spark, state, out, range(600, 650), typ="later")

    stream = read_manifest_stream(spark, str(tmp_path / "state"), schema=TYPED)
    with pytest.raises(StreamingQueryException, match="history-changing merge"):
        _drain(stream, "ms_mut_loud")

    ok = read_manifest_stream(
        spark, str(tmp_path / "state"), schema=TYPED, ignore_mutations=True
    )
    t = spark.table(_drain(ok, "ms_mut_ack"))
    # appends only: the two original commits + the 50 later rows; the
    # merge's rewritten dirs are NOT replayed
    assert t.count() == 250
    assert t.where(F.col("event_type") == "patched").count() == 0


def test_expired_append_is_loud(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    state, out = _store(spark, tmp_path)
    d = _append(spark, state, out, range(700, 710))
    shutil.rmtree(d)
    stream = read_manifest_stream(spark, str(tmp_path / "state"), schema=TYPED)
    with pytest.raises(StreamingQueryException, match="expired before the stream"):
        _drain(stream, "ms_expired")


def test_version_cap_paces_batches(spark, tmp_path):
    """Reader-level unit test of the pacing contract, driven in the
    order REAL Spark uses — latestOffset first, with NO initialOffset
    call (observed: Spark does not reliably invoke initialOffset on the
    serving instance before planning; the r5 review caught the first
    batch arriving uncapped because the floor was only seeded there)."""
    state, out = _store(spark, tmp_path)  # versions 1..2 (two commits)
    _append(spark, state, out, range(300, 310))  # version 3
    r = _ManifestStreamReader(
        TYPED,
        {
            "state_dir": str(tmp_path / "state"),
            "max_versions_per_batch": "1",
        },
    )
    seen_files = []
    versions = [0]
    for _ in range(3):
        end = r.latestOffset()  # the FIRST batch must already be capped
        assert end["version"] == versions[-1] + 1  # capped: one at a time
        parts = r.partitions({"version": versions[-1]}, end)
        seen_files += [p.path for p in parts if p.path]
        r.commit(end)
        versions.append(end["version"])
    assert r.latestOffset() == {"version": 3}  # drained: offset stable
    # every committed file planned exactly once across the three slices
    from grove_spark.sources.file_stats import _list_parquet

    want = sorted(f for d in state.committed_paths() for f in _list_parquet(d))
    assert sorted(seen_files) == want


def test_version_cap_real_stream_batches(spark, tmp_path):
    """INTEGRATION pacing check through a real micro-batch stream: three
    commits, cap=1, processingTime trigger — Spark must deliver exactly
    one version per batch (the r5 review proved the pre-fix cap was
    inert in real execution; this test would have caught it)."""
    import time

    state, out = _store(spark, tmp_path)  # 2 commits x 100 rows
    _append(spark, state, out, range(300, 400))  # 3rd commit, 100 rows
    batches = []

    def record(df, eid):
        batches.append((eid, df.count()))

    stream = read_manifest_stream(
        spark, str(tmp_path / "state"), schema=TYPED,
        max_versions_per_batch=1,
    )
    q = (
        stream.writeStream.foreachBatch(record)
        .option("checkpointLocation", str(tmp_path / "ck_pace"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    deadline = time.time() + 90
    while time.time() < deadline and sum(n for _, n in batches) < 300:
        time.sleep(1)
    q.stop()
    assert [n for _, n in batches[:3]] == [100, 100, 100], batches


def test_drain_helper_completes_capped_backlog(spark, tmp_path):
    """Python sources fall back to single-batch execution under
    availableNow, so a pacing cap would silently stop a one-shot drain
    early; drain_manifest_stream loops runs against one checkpoint until
    the committed offset reaches the store version — and a later call
    resumes with only the new commits."""
    from grove_spark.sources.manifest_stream import drain_manifest_stream

    state, out = _store(spark, tmp_path)  # versions 1..2
    _append(spark, state, out, range(300, 350))  # version 3
    sunk = []

    def conf(df):
        def sink(bdf, eid):
            sunk.append(bdf.count())

        return df.writeStream.foreachBatch(sink)

    res = drain_manifest_stream(
        spark, str(tmp_path / "state"), conf, str(tmp_path / "ck_drain"),
        schema=TYPED, max_versions_per_batch=1,
    )
    assert res["runs"] == 3 and res["version"] == 3
    assert sum(sunk) == 250 and sorted(sunk) == [50, 100, 100]

    _append(spark, state, out, range(400, 420), typ="later")
    res2 = drain_manifest_stream(
        spark, str(tmp_path / "state"), conf, str(tmp_path / "ck_drain"),
        schema=TYPED, max_versions_per_batch=1,
    )
    assert res2 == {"runs": 1, "version": 4}
    assert sum(sunk) == 270  # exactly the 20 new rows, no replay


def test_derived_schema_defaults_partitions_to_string(spark, tmp_path):
    state, out = _store(spark, tmp_path)
    stream = read_manifest_stream(spark, str(tmp_path / "state"))
    got = dict((f.name, f.dataType.simpleString()) for f in stream.schema.fields)
    assert got["date"] == "string" and got["descriptor"] == "string"
    assert got["event_id"] == "bigint" and got["event_time"] == "timestamp"


def test_store_to_store_replication_exactly_once(spark, tmp_path):
    """Composition: the streaming source tailing store A + manifest_sink
    committing into store B = exactly-once store replication. Restarts
    on BOTH sides are idempotent (source offset in the Spark checkpoint,
    sink commits keyed by epoch id)."""
    from grove_spark.sources.scans import manifest_scan
    from grove_spark.state.runstate import RunState
    from grove_spark.streaming.stream import manifest_sink

    src_state, src_out = _store(spark, tmp_path)
    dst_state = RunState(str(tmp_path / "dst_state"))
    ckpt = str(tmp_path / "repl_ckpt")

    def replicate():
        stream = read_manifest_stream(
            spark, str(tmp_path / "state"), schema=TYPED
        ).drop("date")  # the sink re-derives date from event_time
        q = (
            stream.writeStream.foreachBatch(
                manifest_sink(dst_state, str(tmp_path / "dst_out"), key="repl")
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    replicate()
    assert manifest_scan(spark, dst_state, pointer_col="event_time").count() == 200

    _append(spark, src_state, src_out, range(900, 940), typ="later")
    replicate()
    got = manifest_scan(spark, dst_state, pointer_col="event_time")
    want = manifest_scan(spark, src_state, pointer_col="event_time")
    assert got.count() == 240
    cols = want.columns
    assert got.select(*cols).exceptAll(want.select(*cols)).count() == 0
    assert want.select(*cols).exceptAll(got.select(*cols)).count() == 0
    # a third pass replicates nothing new (no duplicate commits)
    v = dst_state.version()
    replicate()
    assert dst_state.version() == v


def test_schema_evolution_through_stream(spark, tmp_path):
    """Old files predate a column; new files carry it. With the widened
    declared schema, old files stream NULLs for the new column and new
    files stream its values (the unionByName(allowMissingColumns)
    behavior of the batch read, executor-side)."""
    import datetime as dt

    state, out = _store(spark, tmp_path)  # event_id 0..199, no 'score'
    wide = StructType(list(SCHEMA.fields) + [StructField("score", LongType())])
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1000 + i, "scored", t0, "logs", "gate", i * 10) for i in range(5)],
        wide,
    )
    from grove_spark.operators.sinks import write_partitioned_parquet
    from grove_spark.sources.file_stats import _list_parquet, parquet_file_stats

    rid = state.new_run_id()
    d = f"{out}/part-{rid}"
    state.register_pending(d)
    write_partitioned_parquet(df, d)
    state.commit(
        "gate", rid, pointer="scored", data_paths=[d],
        file_stats=parquet_file_stats(_list_parquet(d), "event_time"),
    )

    widened = StructType(list(TYPED.fields) + [StructField("score", LongType())])
    stream = read_manifest_stream(spark, str(tmp_path / "state"), schema=widened)
    t = spark.table(_drain(stream, "ms_evolve"))
    assert t.count() == 205
    assert t.where(F.col("score").isNull()).count() == 200  # pre-evolution files
    assert t.where(F.col("score") == 40).count() == 1

    # reading with the NARROW schema still works: the new column is
    # pruned at the footer, not a failure
    narrow = read_manifest_stream(spark, str(tmp_path / "state"), schema=TYPED)
    t2 = spark.table(_drain(narrow, "ms_evolve_narrow"))
    assert t2.count() == 205 and "score" not in t2.columns
