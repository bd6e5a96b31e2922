"""JMESPath-surface extensions of the path language: list indexing,
``[*]`` projections, and comparison predicates — the reference evaluates
these per row with jmespath.search (grove/processors/filter_entries.py:44,
extract_paths.py:86); here they compile once into Catalyst expressions.
"""

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from grove_spark.functions.paths import (
    compile_predicate,
    path_col,
    resolve_type,
)
from grove_spark.operators.processors import extract_paths, filter_entries

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("outcome", T.StructType([
        T.StructField("result", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ])),
    T.StructField("events", T.ArrayType(T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ]))),
])

ROWS = [
    (1, {"result": "FAILURE", "score": 0.9},
     [{"name": "login", "tags": ["a", "b"]}, {"name": "logout", "tags": ["c"]}]),
    (2, {"result": "SUCCESS", "score": 0.2},
     [{"name": "read", "tags": []}]),
    (3, None, None),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, schema=SCHEMA)


def test_index_path(spark, df):
    got = df.select(path_col("events[0].name").alias("v")).collect()
    assert [r["v"] for r in got] == ["login", "read", None]
    assert isinstance(resolve_type(SCHEMA, "events[0].name"), T.StringType)
    assert resolve_type(SCHEMA, "events[0].missing") is None
    assert resolve_type(SCHEMA, "id[0]") is None  # index into non-array


def test_wildcard_projection(spark, df):
    got = df.select(path_col("events[*].name").alias("v")).collect()
    assert got[0]["v"] == ["login", "logout"]
    assert got[1]["v"] == ["read"]
    assert got[2]["v"] is None
    t = resolve_type(SCHEMA, "events[*].name")
    assert isinstance(t, T.ArrayType) and isinstance(t.elementType, T.StringType)


def test_nested_wildcards(spark, df):
    got = df.select(path_col("events[*].tags[0]").alias("v")).collect()
    assert got[0]["v"] == ["a", "c"]
    t = resolve_type(SCHEMA, "events[*].tags[*]")
    assert isinstance(t, T.ArrayType) and isinstance(t.elementType, T.ArrayType)


def test_compile_predicate_forms(spark, df):
    cases = {
        "outcome.result == 'FAILURE'": [1],
        "outcome.result != 'FAILURE'": [2],   # null outcome -> null -> not matched
        "outcome.score >= 0.5": [1],
        "outcome.score < 0.5": [2],
        "id > 2": [3],
    }
    for expr, want in cases.items():
        pred = compile_predicate(SCHEMA, expr)
        got = [r["id"] for r in df.where(F.coalesce(pred, F.lit(False))).select("id").collect()]
        assert sorted(got) == want, expr
    # not a comparison -> None (fall back to truthy-path)
    assert compile_predicate(SCHEMA, "outcome.result") is None
    # unresolvable path -> never matches
    nomatch = compile_predicate(SCHEMA, "missing.path == 'x'")
    assert df.where(nomatch).count() == 0


def test_filter_entries_with_comparisons(spark, df):
    out = filter_entries(df, ["outcome.result == 'FAILURE'"])
    assert sorted(r["id"] for r in out.collect()) == [2, 3]
    out2 = filter_entries(df, ["outcome.score >= 0.5", "id > 2"])
    assert sorted(r["id"] for r in out2.collect()) == [2]


def test_extract_paths_with_index_and_wildcard(spark, df):
    out = extract_paths(df, [
        {"destination": "first", "sources": ["events[0].name"]},
        {"destination": "all_names", "sources": ["events[*].name"]},
        {"destination": "id", "sources": ["id"]},
    ]).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["first"] == "login" and by_id[1]["all_names"] == ["login", "logout"]
    assert by_id[3]["first"] is None and by_id[3]["all_names"] is None


def test_file_secrets_provider(tmp_path):
    import json

    from grove_spark.config import ConnectorConfig, file_secrets_provider, hydrate_secrets

    store = tmp_path / "secrets.json"
    store.write_text(json.dumps({"grove": {"okta": {"token": "tok-9"}}}))
    provider = file_secrets_provider(str(store))
    assert provider("grove/okta/token") == "tok-9"
    assert provider("grove/missing") == ""

    cfg = ConnectorConfig.from_dict({
        "connector": "okta_system_log", "identity": "corp",
        "secrets": {"key": "grove/okta/token"},
    })
    hydrate_secrets([cfg], provider)
    assert cfg.key == "tok-9"
