"""HTTP sink retry semantics (O5) — poster injected, no network."""

import pytest

from grove_spark.operators.sinks import http_sink


def _df(spark):
    return spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")


def test_http_sink_posts_ndjson(spark):
    got = []
    sink = http_sink(got.append)
    sink(_df(spark))
    assert len(got) == 1
    lines = got[0].decode().split("\n")
    assert len(lines) == 2 and '"id":1' in lines[0]


def test_http_sink_retries_then_succeeds(spark):
    attempts = []

    def flaky(payload):
        attempts.append(payload)
        if len(attempts) < 3:
            raise IOError("503")

    sink = http_sink(flaky, retries=5, backoff_s=0.001)
    sink(_df(spark))
    assert len(attempts) == 3


def test_http_sink_exhausts_retries(spark):
    attempts = []

    def dead(payload):
        attempts.append(payload)
        raise IOError("down")

    sink = http_sink(dead, retries=4, backoff_s=0.001)
    with pytest.raises(RuntimeError, match="after 4 retries"):
        sink(_df(spark))
    assert len(attempts) == 4
