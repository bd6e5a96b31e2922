"""Per-dir key bloom sidecars (sources/bloom.py) and their merge
integration: point-membership pruning where range pruning is blind."""

import datetime as dt
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from grove_spark.operators.merge import delete_by_keys, merge_into
from grove_spark.operators.sinks import write_partitioned_parquet
from grove_spark.sources.bloom import (
    _bloom_params,
    _hash_cols,
    bloom_sidecar_path,
    build_key_bloom,
    load_bloom,
    probe_dirs,
)
from grove_spark.sources.file_stats import _list_parquet, parquet_file_stats
from grove_spark.state.runstate import RunState
from test_merge import SCHEMA, _rows


def test_bloom_params_track_fpr():
    m1, k1 = _bloom_params(1000, 0.01)
    m2, k2 = _bloom_params(1000, 0.0001)
    assert m2 > m1 and m1 % 64 == 0 and m2 % 64 == 0
    assert k1 >= 1 and k2 >= k1


def test_build_probe_roundtrip_no_false_negatives(spark, tmp_path):
    d = str(tmp_path / "d")
    spark.createDataFrame(
        [(i, f"u{i}") for i in range(0, 2000, 2)], "event_id long, who string"
    ).write.parquet(d)
    info = build_key_bloom(spark, d, "event_id", fpr=0.01)
    assert os.path.exists(bloom_sidecar_path(d, "event_id"))
    assert info["n"] == 1000 and info["m"] % 64 == 0

    # hash EXACTLY like the build (same Catalyst expressions)
    def hashes(ids):
        pdf = (
            spark.createDataFrame([(i,) for i in ids], "event_id long")
            .select(*_hash_cols("event_id"))
            .toPandas()
        )
        return pdf["__h1"].to_numpy(), pdf["__h2"].to_numpy()

    present = list(range(0, 2000, 2))
    h1, h2 = hashes(present)
    assert probe_dirs([d], "event_id", h1, h2)[d] is True
    # no false negatives: every present key individually hits
    from grove_spark.sources.bloom import _test_bits, load_bloom as _lb

    bits, m, k = _lb(d, "event_id")
    assert _test_bits(bits, h1.view(np.uint64), h2.view(np.uint64), m, k).all()
    # absent keys: the dir-level answer is (almost surely) no
    a1, a2 = hashes(list(range(100001, 100004)))
    assert probe_dirs([d], "event_id", a1, a2)[d] is False
    # false-positive rate over many absent keys stays near the target
    a1, a2 = hashes(list(range(500000, 510000)))
    fp = _test_bits(bits, a1.view(np.uint64), a2.view(np.uint64), m, k).mean()
    assert fp < 0.03  # target 0.01 with slack


def test_missing_or_corrupt_sidecar_keeps_the_dir(spark, tmp_path):
    d = str(tmp_path / "d")
    os.makedirs(d)
    h = np.array([1, 2], dtype=np.int64)
    assert probe_dirs([d], "event_id", h, h)[d] is True  # no sidecar
    with open(bloom_sidecar_path(d, "event_id"), "wb") as f:
        f.write(b"garbage")
    assert load_bloom(d, "event_id") is None
    assert probe_dirs([d], "event_id", h, h)[d] is True  # corrupt -> keep


def _time_partitioned_store(spark, tmp_path, with_blooms):
    """Two dirs split by TIME with event_id ranges fully interleaved —
    range pruning on event_id keeps both dirs, always."""
    state = RunState(str(tmp_path / "state"))
    out = str(tmp_path / "out")
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, "base", t0 + dt.timedelta(days=(i % 2) * 3), "logs", "gate")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    for half, batch in [
        ("early", df.where(F.col("event_time") < "2024-01-02")),   # even ids
        ("late", df.where(F.col("event_time") >= "2024-01-02")),   # odd ids
    ]:
        run_id = f"{half}-{state.new_run_id()}"
        d = os.path.join(out, f"part-{run_id}")
        state.register_pending(d)
        write_partitioned_parquet(batch.repartition(2), d)
        if with_blooms:
            build_key_bloom(spark, d, "event_id", fpr=0.01)
        state.commit(
            half, run_id, pointer=half, data_paths=[d],
            file_stats=parquet_file_stats(_list_parquet(d), "event_time"),
        )
    return state, out


def test_bloom_prunes_where_ranges_cannot(spark, tmp_path):
    # without sidecars: deleting two EVEN keys rewrites both dirs (the
    # interleaved id ranges both contain [10, 42])
    state, out = _time_partitioned_store(spark, tmp_path / "a", with_blooms=False)
    keys = spark.createDataFrame([(10,), (42,)], "event_id long")
    res = delete_by_keys(spark, state, out, keys, ["event_id"])
    assert res["dirs_rewritten"] == 2 and res["rows_deleted"] == 2

    # with sidecars: only the even-id dir is touched
    state, out = _time_partitioned_store(spark, tmp_path / "b", with_blooms=True)
    res = delete_by_keys(spark, state, out, keys, ["event_id"])
    assert res["dirs_rewritten"] == 1 and res["rows_deleted"] == 2
    # and the rewritten dir got a fresh sidecar (coverage never decays)
    assert res["bloom_sidecar"] is True
    assert os.path.exists(bloom_sidecar_path(res["new_dir"], "event_id"))
    from grove_spark.sources.scans import manifest_scan

    got = manifest_scan(spark, state, pointer_col="event_time")
    assert got.count() == 198
    assert got.where(F.col("event_id").isin(10, 42)).count() == 0


def test_bloom_all_pruned_delete_is_a_noop(spark, tmp_path):
    state, out = _time_partitioned_store(spark, tmp_path, with_blooms=True)
    v = state.version()
    # key 77 is odd — in the late dir's id SET? 77 % 2 == 1 -> present.
    # use keys far outside the population instead
    keys = spark.createDataFrame([(900001,), (900003,)], "event_id long")
    assert delete_by_keys(spark, state, out, keys, ["event_id"]) is None
    assert state.version() == v


def test_probe_skipped_past_key_cap(spark, tmp_path):
    """Past bloom_probe_max_keys the probe is skipped and both dirs are
    rewritten — pruning degrades to cost, never correctness."""
    state, out = _time_partitioned_store(spark, tmp_path, with_blooms=True)
    keys = spark.createDataFrame([(10,), (42,)], "event_id long")
    res = delete_by_keys(
        spark, state, out, keys, ["event_id"], bloom_probe_max_keys=1
    )
    assert res["dirs_rewritten"] == 2 and res["rows_deleted"] == 2


def test_distributed_probe_matches_driver_probe(spark, tmp_path):
    """probe_dirs_distributed must answer exactly like the driver-side
    probe for every dir kind: bloomed-with-hits, bloomed-without-hits,
    sidecar-less, corrupt sidecar."""
    from grove_spark.sources.bloom import probe_dirs_distributed

    dirs = []
    for i in range(6):
        d = str(tmp_path / f"d{i}")
        spark.createDataFrame(
            [(j,) for j in range(i * 100, i * 100 + 100)], "event_id long"
        ).coalesce(1).write.parquet(d)
        if i not in (2, 4):  # 2: no sidecar; 4: corrupt
            build_key_bloom(spark, d, "event_id", fpr=1e-6)
        dirs.append(d)
    with open(bloom_sidecar_path(dirs[4], "event_id"), "wb") as f:
        f.write(b"garbage")

    probe_ids = [5, 305]  # hit d0 and d3 (plus conservative d2/d4)
    pdf = (
        spark.createDataFrame([(i,) for i in probe_ids], "event_id long")
        .select(*_hash_cols("event_id"))
        .toPandas()
    )
    h1, h2 = pdf["__h1"].to_numpy(), pdf["__h2"].to_numpy()
    want = probe_dirs(dirs, "event_id", h1, h2)
    got = probe_dirs_distributed(spark, dirs, "event_id", h1, h2)
    assert got == want
    assert got[dirs[0]] and got[dirs[3]]          # true hits
    assert got[dirs[2]] and got[dirs[4]]          # conservative keeps
    assert not got[dirs[1]] and not got[dirs[5]]  # bloom-pruned
