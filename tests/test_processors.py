"""Processor library vs the pure-Python oracle + the reference's golden
assertions (tests/test_processors_*.py in the reference, re-expressed as
DataFrame assertions)."""

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from grove_spark.operators import (
    apply_chain,
    extract_paths,
    filter_entries,
    filter_paths,
    split_path,
    zip_paths,
)
from grove_spark.oracle import pyref

# An Okta-shaped nested fixture (shape of the reference's
# tests/fixtures/okta/system_log/001.json; values synthetic).
OKTA_ENTRY = {
    "published": "2021-06-24T00:04:08.123Z",
    "eventType": "user.session.start",
    "client": {"ipAddress": "198.51.100.10", "device": "Computer"},
    "actor": {
        "id": "00u000000000000000a1",
        "type": "User",
        "alternateId": "user@example.org",
        "displayName": "Example User",
    },
    "outcome": {"result": "SUCCESS"},
    "legacyEventType": "",
}

EXTRACT_CONFIG = {
    "raw": "event.original",
    "fields": [
        {"destination": "'@timestamp'", "sources": ["published"]},
        {"destination": "source.ip", "sources": ["client.ipAddress"]},
        {"destination": "event.type", "sources": ["legacyEventType", "eventType"]},
        {"destination": "user.name", "sources": ["actor.alternateId"]},
        {"destination": "ecs.version", "static": "8.8"},
        {"destination": "missing.field", "sources": ["does.not.exist"]},
    ],
}


def okta_df(spark):
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("published", T.StringType()),
        T.StructField("eventType", T.StringType()),
        T.StructField("client", T.StructType([
            T.StructField("ipAddress", T.StringType()),
            T.StructField("device", T.StringType()),
        ])),
        T.StructField("actor", T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("alternateId", T.StringType()),
            T.StructField("displayName", T.StringType()),
        ])),
        T.StructField("outcome", T.StructType([
            T.StructField("result", T.StringType()),
        ])),
        T.StructField("legacyEventType", T.StringType()),
    ])
    return spark.createDataFrame([OKTA_ENTRY, OKTA_ENTRY], schema=schema)


def test_extract_paths_golden(spark):
    """Mirrors reference tests/test_processors_extract_paths.py:61-80."""
    df = extract_paths(
        okta_df(spark), EXTRACT_CONFIG["fields"], raw=EXTRACT_CONFIG["raw"]
    )
    row = df.first().asDict(recursive=True)
    assert row["@timestamp"] == "2021-06-24T00:04:08.123Z"
    assert row["source"]["ip"] == "198.51.100.10"
    # first-truthy wins: legacyEventType == "" loses to eventType
    assert row["event"]["type"] == "user.session.start"
    assert row["user"]["name"] == "user@example.org"
    assert row["ecs"]["version"] == "8.8"
    assert row["missing"]["field"] is None
    # raw embeds the whole original entry as JSON
    raw = json.loads(row["event"]["original"])
    assert raw["actor"]["displayName"] == "Example User"
    # unmapped fields dropped
    assert set(df.columns) == {"@timestamp", "source", "event", "user", "ecs", "missing"}


def test_extract_paths_matches_oracle(spark):
    df = extract_paths(okta_df(spark), EXTRACT_CONFIG["fields"])
    got = df.first().asDict(recursive=True)
    [want] = pyref.extract_paths(OKTA_ENTRY, EXTRACT_CONFIG["fields"])
    # oracle writes None at missing destinations too
    assert got["@timestamp"] == want["@timestamp"]
    assert got["source"] == want["source"]
    assert got["event"] == want["event"]
    assert got["user"] == want["user"]
    assert got["missing"]["field"] is None and want["missing"]["field"] is None


def test_filter_entries_truthy_and_sql(spark):
    entries = [
        {"eventType": "user.session.start", "system": False, "n": 1},
        {"eventType": "system.push", "system": True, "n": 2},
        {"eventType": "user.logout", "system": False, "n": 3},
    ]
    df = spark.createDataFrame(entries)
    out = filter_entries(df, ["system"]).collect()
    assert sorted(r.n for r in out) == [1, 3]
    out2 = filter_entries(df, ["sql:eventType LIKE 'user.%'"]).collect()
    assert [r.n for r in out2] == [2]
    # oracle agreement on the truthy-path form
    keep = [e for e in entries if pyref.filter_entries(e, ["system"])]
    assert sorted(r.n for r in out) == sorted(e["n"] for e in keep)


def test_filter_paths_nested(spark):
    df = okta_df(spark)
    out = filter_paths(df, ["actor.id", "legacyEventType", "not.there"])
    row = out.first().asDict(recursive=True)
    assert "legacyEventType" not in row
    assert "id" not in row["actor"]
    assert row["actor"]["type"] == "User"


GSUITE_ENTRY = {
    "id": {"time": "2023-01-01T00:00:00Z", "applicationName": "drive"},
    "actor": {"email": "user@example.org"},
    "events": [
        {"type": "access", "name": f"ev{i}",
         "parameters": [
             {"name": "owner", "value": "a@example.org", "boolValue": None},
             {"name": "visibility", "value": None, "boolValue": True},
             {"name": "broken", "value": None, "boolValue": None},
             {"value": "keyless"},
         ]}
        for i in range(5)
    ],
}


def gsuite_df(spark):
    import pyspark.sql.types as T

    param_t = T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("boolValue", T.BooleanType()),
    ])
    schema = T.StructType([
        T.StructField("id", T.StructType([
            T.StructField("time", T.StringType()),
            T.StructField("applicationName", T.StringType()),
        ])),
        T.StructField("actor", T.StructType([T.StructField("email", T.StringType())])),
        T.StructField("events", T.ArrayType(T.StructType([
            T.StructField("type", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("parameters", T.ArrayType(param_t)),
        ]))),
    ])
    return spark.createDataFrame([GSUITE_ENTRY], schema=schema)


def test_split_path_fanout(spark):
    """Reference tests/test_processors_split_path.py:33-56 — 1 entry with
    5 events -> 5 entries, each with a single (scalar) event."""
    out = split_path(gsuite_df(spark), "events")
    rows = out.collect()
    assert len(rows) == 5
    names = sorted(r.asDict(recursive=True)["events"]["name"] for r in rows)
    assert names == [f"ev{i}" for i in range(5)]
    # remainder of the entry untouched
    assert all(r.asDict(recursive=True)["actor"]["email"] == "user@example.org" for r in rows)
    # oracle cardinality agreement
    assert len(pyref.split_path(GSUITE_ENTRY, "events")) == 5


def test_split_path_empty_passthrough(spark):
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("k", T.IntegerType()),
        T.StructField("vals", T.ArrayType(T.StringType())),
    ])
    df = spark.createDataFrame([(1, []), (2, None), (3, ["a", "b"])], schema=schema)
    out = split_path(df, "vals").collect()
    by_k = {}
    for r in out:
        by_k.setdefault(r.k, []).append(r.vals)
    assert by_k[1] == [None] and by_k[2] == [None]
    assert sorted(by_k[3]) == ["a", "b"]


def test_zip_paths_kv_to_map(spark):
    """K/V parameter list -> map; keyless and valueless children skipped
    (reference zip_paths.py:84-97)."""
    df = split_path(gsuite_df(spark), "events")
    out = zip_paths(df, "events.parameters", key="name", values=["value", "boolValue"])
    row = out.first().asDict(recursive=True)
    params = row["events"]["parameters"]
    assert params == {"owner": "a@example.org", "visibility": "true"}
    # oracle agreement (oracle keeps native types; engine casts to string).
    # NB the oracle mutates through aliased children exactly like the
    # reference (split_path.py:63 comment) — deep-copy the fixture.
    entry_copy = json.loads(json.dumps(GSUITE_ENTRY))
    [want] = pyref.zip_paths(
        pyref.split_path(entry_copy, "events")[0],
        "events.parameters", "name", ["value", "boolValue"],
    )
    want_params = {k: str(v).lower() if isinstance(v, bool) else str(v)
                   for k, v in want["events"]["parameters"].items()}
    assert params == want_params


def test_zip_paths_missing_source_passthrough(spark):
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("k", T.IntegerType()),
        T.StructField("params", T.ArrayType(T.StructType([
            T.StructField("name", T.StringType()),
            T.StructField("value", T.StringType()),
        ]))),
    ])
    df = spark.createDataFrame([(1, None)], schema=schema)
    out = zip_paths(df, "params", key="name", values=["value"]).collect()
    assert out[0].params is None


def test_zip_paths_last_duplicate_wins(spark):
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("params", T.ArrayType(T.StructType([
            T.StructField("name", T.StringType()),
            T.StructField("value", T.StringType()),
        ]))),
    ])
    df = spark.createDataFrame(
        [([("a", "1"), ("a", "2"), ("b", "3")],)], schema=schema
    )
    out = zip_paths(df, "params", key="name", values=["value"]).first()
    assert dict(out.params) == {"a": "2", "b": "3"}


def test_chain_flatmap_semantics(spark):
    """A full chain (the canonical gsuite flattened_drive_activities
    shape: split -> zip -> extract) matches the oracle end-to-end."""
    chain = [
        {"processor": "split_path", "source": "events"},
        {"processor": "zip_paths", "source": "events.parameters",
         "key": "name", "values": ["value", "boolValue"]},
        {"processor": "extract_paths", "fields": [
            {"destination": "time", "sources": ["id.time"]},
            {"destination": "owner", "sources": ["events.parameters.owner"]},
            {"destination": "event_name", "sources": ["events.name"]},
        ]},
    ]
    got = [r.asDict(recursive=True) for r in apply_chain(gsuite_df(spark), chain).collect()]
    want = pyref.apply_chain([GSUITE_ENTRY], chain)
    assert len(got) == len(want) == 5
    got_s = sorted(got, key=lambda r: r["event_name"])
    want_s = sorted(want, key=lambda r: r["event_name"])
    for g, w in zip(got_s, want_s):
        assert g["time"] == w["time"]
        assert g["owner"] == w["owner"]
        assert g["event_name"] == w["event_name"]
