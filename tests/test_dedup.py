"""Dedup operators vs the oracle + the reference's golden dedup suite
(tests/test_connectors_deduplicate.py re-expressed)."""

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from grove_spark.functions.hashing import entry_hash
from grove_spark.operators.dedup import (
    boundary_hashes,
    dedup_by_hash,
    dedup_by_pointer,
    dedup_within_batch,
)
from grove_spark.oracle import pyref

# the shape of the reference's tests/fixtures/grove/chronological/001-003
PAGE1 = [{"timestamp": str(i), "event": f"Example {c}"} for i, c in
         zip(range(1, 5), "ABCD")]
PAGE2 = [{"timestamp": str(i), "event": f"Example {c}"} for i, c in
         zip(range(4, 8), "DEFG")]  # overlaps at 4

SCHEMA = T.StructType([
    T.StructField("timestamp", T.StringType()),
    T.StructField("event", T.StringType()),
])


def test_hash_parity_with_reference(spark):
    """entry_hash == md5(json.dumps(entry, separators=(',',':'))) given
    the same key order — byte-exact parity with hash_entry
    (grove/connectors/__init__.py:590-602)."""
    df = spark.createDataFrame(PAGE1, schema=SCHEMA)
    got = {r["event"]: r["h"] for r in
           df.withColumn("h", entry_hash(["timestamp", "event"])).collect()}
    for e in PAGE1:
        assert got[e["event"]] == pyref.hash_entry(e)


def test_first_run_saves_all_and_pointer(spark):
    """Golden: first run saves the full page, pointer = last timestamp
    (reference test_connectors_deduplicate.py:64-74)."""
    df = spark.createDataFrame(PAGE1, schema=SCHEMA)
    out = dedup_by_pointer(df, "timestamp", None)
    assert out.count() == 4
    ptr = out.agg(F.max("timestamp")).first()[0]
    assert ptr == "4"


def test_rerun_overlapping_page_saves_only_new(spark):
    """Golden: re-collecting an overlapping page after pointer commit
    saves only rows past the pointer (reference :75-85 outcome)."""
    df2 = spark.createDataFrame(PAGE2, schema=SCHEMA)
    out = dedup_by_pointer(df2, "timestamp", "4")
    rows = sorted(r["timestamp"] for r in out.collect())
    assert rows == ["5", "6", "7"]
    # oracle (positional walk) agrees on the same page
    want = pyref.dedup_by_pointer_chronological(PAGE2, "timestamp", "4")
    assert sorted(w["timestamp"] for w in want) == rows


def test_rerun_identical_final_page_saves_zero(spark):
    """Golden: replaying the final page yields 0 new entries
    (reference :117-138: 'save(...) == 0 on identical replay')."""
    df2 = spark.createDataFrame(PAGE2, schema=SCHEMA)
    out = dedup_by_pointer(df2, "timestamp", "7")
    assert out.count() == 0


def test_reverse_chronological_same_predicate(spark):
    """Reverse-order sources need no special windowing in Spark — the
    exact predicate gives the same no-loss/no-dup outcome the reference's
    window machinery fights for (:462-548)."""
    rev = list(reversed(PAGE2))
    df = spark.createDataFrame(rev, schema=SCHEMA)
    out = dedup_by_pointer(df, "timestamp", "4", log_order="REVERSE_CHRONOLOGICAL")
    got = sorted(r["timestamp"] for r in out.collect())
    assert got == ["5", "6", "7"]
    # The reference's positional walk PREFERS DUPLICATES: it keeps the
    # pointer-valued entry too (:724-754), relying on the hash dedup to
    # drop it. The exact predicate equals oracle-minus-already-saved.
    want = pyref.dedup_by_pointer_reverse(rev, "timestamp", "4")
    assert sorted(w["timestamp"] for w in want) == ["4", "5", "6", "7"]
    already_saved = {"4"}
    assert [w["timestamp"] for w in sorted(want, key=lambda x: x["timestamp"])
            if w["timestamp"] not in already_saved] == got


def test_dedup_by_hash_boundary_state(spark):
    """D1: same-pointer duplicates across runs are dropped via the seen
    table; different content at the same pointer survives."""
    page = [
        {"timestamp": "4", "event": "Example D"},
        {"timestamp": "4", "event": "Example D2"},
        {"timestamp": "5", "event": "Example E"},
    ]
    df = spark.createDataFrame(page, schema=SCHEMA)
    seen = boundary_hashes(
        spark.createDataFrame(PAGE1, schema=SCHEMA), ["timestamp", "event"], "timestamp"
    )
    # boundary state only carries pointer '4' hashes
    assert {r["pointer"] for r in seen.collect()} == {"4"}
    out = dedup_by_hash(df, seen, ["timestamp", "event"], "timestamp")
    got = sorted(r["event"] for r in out.collect())
    assert got == ["Example D2", "Example E"]
    # oracle agreement
    old = {p: set(h) for p, h in
           pyref.dedup_by_hash(PAGE1, "timestamp", {})[1].items() if p == "4"}
    want, _ = pyref.dedup_by_hash(page, "timestamp", old)
    assert sorted(w["event"] for w in want) == got


def test_dedup_within_batch(spark):
    df = spark.createDataFrame(PAGE1 + PAGE1, schema=SCHEMA)
    assert dedup_within_batch(df, ["timestamp", "event"]).count() == 4


def test_dedup_lines_none_and_first(spark):
    rows = [
        (1, "keep me\nshared banner\nunique one"),
        (2, "shared banner\nunique two"),
        (3, "shared banner"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    from grove_spark.operators.dedup import dedup_lines

    out = {r.doc_id: r for r in dedup_lines(docs).collect()}
    assert out[1].n_lines == 3 and out[1].n_kept == 2
    assert out[1].text_kept == "keep me\nunique one"
    # doc 3 was ALL boilerplate: still emitted, empty text
    assert out[3].n_kept == 0 and out[3].text_kept == ""

    first = {r.doc_id: r for r in dedup_lines(docs, keep="first").collect()}
    # first occurrence by (doc_id, pos): doc 1 keeps the banner
    assert first[1].text_kept == "keep me\nshared banner\nunique one"
    assert first[2].text_kept == "unique two"
    assert first[3].n_kept == 0

    with pytest.raises(ValueError):
        dedup_lines(docs, keep="all")
