"""HTTP sink retry semantics (O5) — poster injected, no network.

The poster runs on EXECUTORS (foreachPartition), so the test seam spools
attempts to disk instead of mutating driver-side lists: Python workers
are separate processes even in local mode.
"""

import glob
import os
import uuid

import pytest

from grove_spark.operators.sinks import http_sink, stdout_sink


def _df(spark):
    return spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").coalesce(1)


def _spool_poster(spool: str, fail_first: int = 0):
    """A picklable poster that records each attempt as a file and fails
    the first ``fail_first`` attempts (per worker-visible spool dir)."""

    def poster(payload: bytes) -> None:
        n_before = len(glob.glob(os.path.join(spool, "attempt-*")))
        with open(os.path.join(spool, f"attempt-{uuid.uuid4().hex}"), "wb") as f:
            f.write(payload)
        if n_before < fail_first:
            raise IOError("503")

    return poster


def test_http_sink_posts_ndjson(spark, tmp_path):
    spool = str(tmp_path)
    sink = http_sink(_spool_poster(spool))
    sink(_df(spark))
    posts = glob.glob(os.path.join(spool, "attempt-*"))
    assert len(posts) == 1  # one partition -> one post, from the executor
    lines = open(posts[0], "rb").read().decode().split("\r\n")
    assert len(lines) == 2 and '"id":1' in lines[0]


def test_http_sink_retries_then_succeeds(spark, tmp_path):
    spool = str(tmp_path)
    sink = http_sink(_spool_poster(spool, fail_first=2), retries=5, backoff_s=0.001)
    sink(_df(spark))
    assert len(glob.glob(os.path.join(spool, "attempt-*"))) == 3


def test_http_sink_exhausts_retries(spark, tmp_path):
    spool = str(tmp_path)
    sink = http_sink(_spool_poster(spool, fail_first=99), retries=4, backoff_s=0.001)
    with pytest.raises(Exception, match="after 4 retries"):
        sink(_df(spark))
    assert len(glob.glob(os.path.join(spool, "attempt-*"))) == 4


def test_http_sink_never_collects():
    """The 100 TB guard: no driver-side collect in the sink module."""
    import inspect

    import grove_spark.operators.sinks as sinks

    src = inspect.getsource(sinks)
    assert ".collect()" not in src


def test_stdout_envelope(spark):
    """O4 envelope parity with grove/outputs/local_stdout.py:41-58."""
    import io
    import json

    buf = io.StringIO()
    n = stdout_sink(
        _df(spark), connector="okta_system_log", identity="corp",
        operation="all", descriptor="logs", datestamp="2024-01-01T00:00:00Z",
        stream=buf,
    )
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert n == 2 and len(lines) == 2
    env = lines[0]
    assert set(env) == {
        "part", "kind", "descriptor", "connector", "identity",
        "operation", "datestamp", "message",
    }
    assert env["connector"] == "okta_system_log"
    assert env["datestamp"].endswith("Z")
    assert env["message"] == {"id": 1, "v": "a"}
