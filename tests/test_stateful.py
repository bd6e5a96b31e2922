"""applyInPandasWithState sessionization: batch-mode equivalence vs a
simple oracle, plus streaming execution."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from grove_spark.streaming.stateful import sessionize

ROWS = [
    # source, epoch_ms, n_tok — two sessions for a (gap > 60s), one for b
    ("a", 0, 10), ("a", 10_000, 20), ("a", 30_000, 5),
    ("a", 200_000, 7), ("a", 220_000, 3),
    ("b", 0, 1), ("b", 50_000, 2), ("b", 100_000, 4),
]


def _df(spark):
    pdf = pd.DataFrame(ROWS, columns=["source", "ms", "n_tok"])
    pdf["event_time"] = pd.to_datetime(pdf["ms"], unit="ms")
    return spark.createDataFrame(pdf[["source", "event_time", "n_tok"]])


def oracle_sessions(gap_ms=60_000):
    out = []
    by_src = {}
    for s, ms, tok in ROWS:
        by_src.setdefault(s, []).append((ms, tok))
    for s, evs in by_src.items():
        evs.sort()
        start, last, rows, toks = evs[0][0], evs[0][0], 0, 0
        for ms, tok in evs:
            if ms - last > gap_ms:
                out.append((s, start, last, rows, toks))
                start, rows, toks = ms, 0, 0
            last = ms
            rows += 1
            toks += tok
        out.append((s, start, last, rows, toks))
    return sorted(out)


def test_sessionize_streaming_matches_oracle(spark, tmp_path):
    """Run as a real stream (availableNow over a parquet dir), then force
    the final open sessions out by checking only CLOSED ones against the
    oracle's closed set."""
    src_dir = str(tmp_path / "in")
    _df(spark).write.parquet(src_dir)
    stream = spark.readStream.schema(_df(spark).schema).parquet(src_dir)
    sess = sessionize(stream, gap_ms=60_000)
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["source"], r["session_start_ms"], r["session_end_ms"], r["rows"], r["sum_n_tok"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    )
    want_all = set(oracle_sessions())
    # sessions closed by a later event MUST be emitted; each source's
    # final session sits in state and is emitted only if the
    # processing-time timeout fires before the availableNow query drains
    # (wall-clock dependent) — so: closed ⊆ got ⊆ all, nothing invented
    want_closed = {
        s for s in want_all
        if any(w[0] == s[0] and w[1] > s[1] for w in want_all)
    }
    got_set = set(got)
    assert want_closed <= got_set <= want_all
    assert ("a", 0, 30_000, 3, 35) in got_set
