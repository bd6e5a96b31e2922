"""The north rule's deployment shape, actually executed: package the
library as a zip, launch `spark-submit --py-files grove_spark.zip
jobs/run_pipeline.py` as a REAL subprocess (its own JVM + driver, no
test-session state), and check the fleet tick's output contract."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_package(dest: str) -> str:
    zpath = os.path.join(dest, "grove_spark.zip")
    pkg = os.path.join(REPO, "grove_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in files:
                if fn.endswith(".pyc"):
                    continue
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_py_files_fleet_tick(tmp_path):
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not on PATH in this environment")

    zpath = _zip_package(str(tmp_path))
    out = str(tmp_path / "routed")
    state = str(tmp_path / "state")
    env = dict(os.environ)
    # executors receive the package through --py-files (the job script
    # itself adds the repo to the DRIVER's sys.path); strip PYTHONPATH
    # so nothing else leaks in
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zpath,
            os.path.join(REPO, "jobs", "run_pipeline.py"),
            "--fixture-rows", "300",
            "--out", out,
            "--state", state,
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=280,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # the job prints ONE json line with the tick's result
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON result line in job stdout:\n{proc.stdout[-2000:]}"
    res = json.loads(lines[-1])
    assert res["due"] >= 1 and res["run_id"]
    assert res["committed_paths"], "fleet tick committed no data paths"
    for p in res["committed_paths"]:
        assert os.path.isdir(p), f"committed path missing on disk: {p}"
    # rerunning the same tick is idempotent at the manifest level: the
    # second invocation must not duplicate committed paths
    proc2 = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zpath,
            os.path.join(REPO, "jobs", "run_pipeline.py"),
            "--fixture-rows", "300",
            "--out", out,
            "--state", state,
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=280,
    )
    assert proc2.returncode == 0, proc2.stderr[-3000:]
    lines2 = [l for l in proc2.stdout.splitlines() if l.startswith("{")]
    assert lines2, f"no JSON result line in rerun stdout:\n{proc2.stdout[-2000:]}"
    res2 = json.loads(lines2[-1])
    # actually assert idempotence: the rerun (nothing newly due inside
    # the frequency window) must not extend the committed-path set
    assert set(res2["committed_paths"]) == set(res["committed_paths"]), (
        "manifest gained paths on an idempotent rerun"
    )
