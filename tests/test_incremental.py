"""Incremental append reads over the manifested store
(RunState.incremental_paths + scans.incremental_append_scan): the
"train only on data I haven't consumed" primitive, with the Iceberg
contract around rewrite snapshots. Plus bloom-coverage preservation
through compaction."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from grove_spark.operators.compaction import compact_runs
from grove_spark.operators.merge import merge_into
from grove_spark.sources.scans import incremental_append_scan
from grove_spark.state.runstate import RunState
from test_merge import SCHEMA, _rows, _store


def _append(spark, state, out, ids, typ="base"):
    from grove_spark.operators.sinks import write_partitioned_parquet
    from grove_spark.sources.file_stats import _list_parquet, parquet_file_stats

    df = spark.createDataFrame(_rows(ids, typ), SCHEMA)
    rid = state.new_run_id()
    d = os.path.join(out, f"part-{rid}")
    state.register_pending(d)
    write_partitioned_parquet(df.repartition(2), d)
    state.commit(
        "gate", rid, pointer=str(max(ids)), data_paths=[d],
        file_stats=parquet_file_stats(_list_parquet(d), "event_time"),
    )
    return d


def test_incremental_checkpoint_loop(spark, tmp_path):
    state, out = _store(spark, tmp_path)  # two appends: 200 rows
    # consumer starts from scratch
    df = incremental_append_scan(spark, state, since_version=0)
    assert df.count() == 200
    ckpt = df._grove_incremental["version"]
    assert ckpt == state.version()

    # nothing new: empty frame, SAME schema incl. hive partition cols
    df2 = incremental_append_scan(spark, state, since_version=ckpt)
    assert df2.count() == 0
    assert df2.columns == df.columns
    assert df2.select("descriptor", "date").count() == 0  # no fork on empty

    # new batch: only it comes back
    _append(spark, state, out, range(500, 560), typ="later")
    df3 = incremental_append_scan(spark, state, since_version=ckpt)
    assert df3.count() == 60
    assert {r["event_type"] for r in df3.select("event_type").distinct().collect()} == {"later"}


def test_compaction_in_window_is_skipped_not_double_read(spark, tmp_path):
    state, out = _store(spark, tmp_path)
    ckpt = 0
    res = compact_runs(
        spark, state, out, pointer_col="event_time",
        small_file_bytes=1 << 30,
    )
    assert res is not None
    info = state.incremental_paths(ckpt)
    assert len(info["compactions"]) == 1 and not info["mutations"]
    # the window's appends are exactly the original dirs — the
    # compacted copy is layout, not data
    df = incremental_append_scan(spark, state, since_version=ckpt)
    assert df.count() == 200
    assert sorted(info["appended"]) == sorted(res["replaced"])


def test_merge_in_window_raises_unless_acknowledged(spark, tmp_path):
    state, out = _store(spark, tmp_path)
    v0 = state.version()
    upd = spark.createDataFrame(
        _rows([150], "patched") + _rows([5000], "inserted"), SCHEMA
    )
    merge_into(spark, state, out, upd, ["event_id"])
    _append(spark, state, out, range(600, 650), typ="later")

    with pytest.raises(ValueError, match="history-changing merge"):
        incremental_append_scan(spark, state, since_version=v0)
    df = incremental_append_scan(
        spark, state, since_version=v0, ignore_mutations=True
    )
    # appends only: the 50 new rows; the upsert/insert are NOT reflected
    assert df.count() == 50
    assert df._grove_incremental["mutations"]


def test_expired_unconsumed_append_is_loud(spark, tmp_path):
    state, out = _store(spark, tmp_path)
    d = _append(spark, state, out, range(700, 710))
    shutil.rmtree(d)  # retention beat the consumer to it
    with pytest.raises(ValueError, match="expired before they were consumed"):
        incremental_append_scan(spark, state, since_version=0)


def test_compaction_rebuilds_bloom_sidecars(spark, tmp_path):
    from grove_spark.sources.bloom import bloom_sidecar_path, build_key_bloom, load_bloom

    state, out = _store(spark, tmp_path)
    for d in state.committed_paths():
        build_key_bloom(spark, d, "event_id", fpr=1e-4)
    res = compact_runs(
        spark, state, out, pointer_col="event_time",
        small_file_bytes=1 << 30,
    )
    assert res is not None
    doc = load_bloom(res["new_dir"], "event_id")
    assert doc is not None, "compaction dropped the bloom sidecar"
    # the rebuilt bloom covers the union of keys
    pdf = (
        spark.read.option("basePath", res["new_dir"]).parquet(res["new_dir"])
        .select(F.xxhash64("event_id").alias("__h1"),
                F.xxhash64(F.lit(0xB10F), F.col("event_id")).alias("__h2"))
        .toPandas()
    )
    from grove_spark.sources.bloom import _test_bits
    import numpy as np

    bits, m, k = doc
    assert _test_bits(
        bits, pdf["__h1"].to_numpy().view(np.uint64),
        pdf["__h2"].to_numpy().view(np.uint64), m, k,
    ).all()
