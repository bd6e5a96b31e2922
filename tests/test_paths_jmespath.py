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
    # mixed-NUMERIC struct: the object wildcard promotes to double
    T.StructField("metrics", T.StructType([
        T.StructField("lat", T.DoubleType()),
        T.StructField("cnt", T.LongType()),
    ])),
])

ROWS = [
    (1, {"result": "FAILURE", "score": 0.9},
     [{"name": "login", "tags": ["a", "b"]}, {"name": "logout", "tags": ["c"]}],
     {"lat": 0.25, "cnt": 7}),
    (2, {"result": "SUCCESS", "score": 0.2},
     [{"name": "read", "tags": []}],
     {"lat": 1.5, "cnt": 2}),
    (3, None, None, None),
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
        # null-safe !=: the null-outcome row MATCHES (jmespath: null != x)
        "outcome.result != 'FAILURE'": [2, 3],
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


# ---------------------------------------------------------------------------
# round 3: slices, negative indexes, functions, multiselect-hash — checked
# AGAINST THE PUBLIC jmespath LIBRARY as oracle (the engine the reference
# calls per row).
# ---------------------------------------------------------------------------

jmespath = pytest.importorskip("jmespath")

DICT_ROWS = [
    {"id": 1, "outcome": {"result": "FAILURE", "score": 0.9},
     "events": [{"name": "login", "tags": ["a", "b"]},
                {"name": "logout", "tags": ["c"]}],
     "metrics": {"lat": 0.25, "cnt": 7}},
    {"id": 2, "outcome": {"result": "SUCCESS", "score": 0.2},
     "events": [{"name": "read", "tags": []}],
     "metrics": {"lat": 1.5, "cnt": 2}},
    {"id": 3, "outcome": None, "events": None, "metrics": None},
]

EXPRS = [
    "events[0:1].name",
    "events[0:2].name",
    "events[1:].name",
    "events[:1].name",
    "events[-1:].name",
    "events[:-1].name",
    "events[-2:-1].name",
    "events[5:9].name",
    "events[-1].name",
    "events[-5].name",
    "length(events)",
    "length(outcome.result)",
    "length(events[0].tags)",
    "length(outcome)",          # length(object) = key count
    "events[0] | length(@)",    # the round-3 fuzz counterexample
    "outcome | length(@)",
    "contains(events[0].tags, 'a')",
    "starts_with(outcome.result, 'FAIL')",
    "ends_with(outcome.result, 'ESS')",
    "{res: outcome.result, n: length(events)}",
    # filter expressions: comparisons, bare-path truthiness, functions,
    # boolean combinators, parens, negation
    "events[?name == 'login'].name",
    "events[?tags].name",
    "events[?!tags].name",
    "events[?contains(tags, 'c')].name",
    "events[?name == 'login' || name == 'logout'].name",
    "events[?name == 'login' && contains(tags, 'a')].name",
    "events[?(name == 'read')].name",
    "events[?!(name == 'read')].name",
    "events[?length(tags) >= `2`].name",
    "length(events[?tags])",
    # flatten projections and pipes
    "events[].name",
    "events[].tags",
    "events[].tags[]",
    "events[*].tags[]",
    "events[?name == 'login'].tags[]",
    "events[*].name | [0]",
    "events[*].name | [0:1]",
    "events[?tags] | [0].name",
    "length(events[].tags[])",
    # @, pipes with functions, multiselect-list
    "events[*].name | length(@)",
    "events[0].tags | [0]",
    "events[].tags[] | length(@)",
    "[outcome.result, events[0].name]",
    "events[0].tags[?@ == 'a']",
    "events[?tags[?@ == 'c']].name",
    # review regressions: bracket OPS on a pipe RHS (incl. nested
    # filters) must compile as ops, not multiselect-lists
    "events | [?tags[?@ == 'c']].name",
    "events | [?name == 'read'].name",
    "events | [0:1].name | [0]",
    # round 4: stepped slices (python slice.indices semantics)
    "events[::2].name",
    "events[::-1].name",
    "events[1::2].name",
    "events[:1:2].name",
    "events[-1::-1].name",
    "events[::-2].name",
    "events[0].tags[::-1]",
    "events[0].tags[::2]",
    "events[*].name | [::-1]",
    "events[::-1].name | [0]",
    # round 4: object wildcard (values projection; numeric promotion)
    "metrics.*",
    "metrics.* | [0]",
    "length(metrics.*)",
    "metrics.* | [::-1]",
    # round 4: the function library (each vs the public implementation)
    "sum(metrics.*)",
    "avg(metrics.*)",
    "min(metrics.*)",
    "max(metrics.*)",
    "min(events[*].name)",
    "max(events[*].name)",
    "abs(outcome.score)",
    "ceil(outcome.score)",
    "floor(outcome.score)",
    "reverse(events[*].name)",
    "reverse(outcome.result)",
    "sort(events[*].name)",
    "sort(events[].tags[])",
    "join('-', events[*].name)",
    "join('', events[0].tags)",
    "keys(outcome)",
    "keys(metrics)",
    "values(metrics)",
    "not_null(outcome.result, 'fallback')",
    "not_null(missing, outcome.result)",
    "to_number(outcome.result)",
    "to_number(to_string(metrics.cnt))",
    "to_string(outcome.score)",
    "to_string(metrics.cnt)",
    "to_string(outcome.result)",
    "to_string(missing)",
    "type(outcome.score)",
    "type(outcome.result)",
    "type(events)",
    "type(outcome)",
    "type(missing)",
    "type(events[0].tags)",
    "merge(outcome, metrics)",
    "map(&name, events)",
    "map(&tags[0], events)",
    "map(&length(tags), events)",
    "sort_by(events, &name)[*].name",
    "sort_by(events, &name) | [0].name",
    "min_by(events, &name).name",
    "max_by(events, &name).name",
    "sort_by(metrics.*, &@)",
    "to_array(outcome.result)",
    "to_array(events[*].name)",
    "to_array(events)",
    "to_array(missing)",
    "length(to_array(id))",
]


def _jp(expr, row):
    """jmespath oracle; its invalid-type errors (functions over null)
    map to our documented lenient-null deviation."""
    try:
        return jmespath.search(expr, row)
    except jmespath.exceptions.JMESPathTypeError:
        return None


def _plain(v):
    if hasattr(v, "asDict"):
        return {k: _plain(x) for k, x in v.asDict().items()}
    if isinstance(v, list):
        return [_plain(x) for x in v]
    return v


def test_expression_surface_matches_jmespath_library(df):
    from grove_spark.functions.paths import compile_expr

    cols = []
    for i, e in enumerate(EXPRS):
        sub = compile_expr(SCHEMA, e)
        assert sub is not None, e
        cols.append(sub[0].alias(f"e{i}"))
    got = df.select(F.col("id"), *cols).collect()
    for r in got:
        want_row = next(d for d in DICT_ROWS if d["id"] == r["id"])
        for i, e in enumerate(EXPRS):
            want = _jp(e, want_row)
            have = _plain(r[f"e{i}"])
            if want is None and isinstance(have, dict):
                # documented lenient deviation: jmespath aborts a whole
                # multiselect when a member function hits null; the
                # typed compilation yields a struct of nulls instead
                assert all(v is None for v in have.values()), e
                continue
            assert have == want, f"{e} on id={r['id']}: spark={have} jmespath={want}"


def test_randomized_slices_match_jmespath(df):
    """Every (a, b) slice pair in a window around the array bounds, with
    and without a projected remainder — exact parity with the library."""
    from grove_spark.functions.paths import compile_expr

    cases = []
    for a in [None, -4, -2, -1, 0, 1, 2, 4]:
        for b in [None, -4, -2, -1, 0, 1, 2, 4]:
            sa = "" if a is None else str(a)
            sb = "" if b is None else str(b)
            cases.append(f"events[{sa}:{sb}].name")
            cases.append(f"events[0].tags[{sa}:{sb}]")
    # every (a, b, s) with an explicit step — python slice.indices parity
    for a in [None, -3, -1, 0, 1, 3]:
        for b in [None, -3, -1, 0, 1, 3]:
            for s in [-3, -2, -1, 1, 2, 3]:
                sa = "" if a is None else str(a)
                sb = "" if b is None else str(b)
                cases.append(f"events[{sa}:{sb}:{s}].name")
                cases.append(f"events[0].tags[{sa}:{sb}:{s}]")
    cols = [compile_expr(SCHEMA, e)[0].alias(f"c{i}") for i, e in enumerate(cases)]
    got = df.select(F.col("id"), *cols).collect()
    for r in got:
        want_row = next(d for d in DICT_ROWS if d["id"] == r["id"])
        for i, e in enumerate(cases):
            assert _plain(r[f"c{i}"]) == _jp(e, want_row), f"{e} id={r['id']}"


def test_function_predicates_in_filter_entries(df):
    out = filter_entries(df, ["length(events) >= 2"])
    assert sorted(r["id"] for r in out.collect()) == [2, 3]
    out2 = filter_entries(df, ["contains(events[0].tags, 'a')"])
    assert sorted(r["id"] for r in out2.collect()) == [2, 3]


def test_multiselect_hash_source_in_extract_paths(df):
    out = extract_paths(
        df,
        [{"destination": "summary",
          "sources": ["{res: outcome.result, n: length(events)}"]}],
    ).collect()
    vals = sorted(
        [(r["summary"]["res"], r["summary"]["n"]) for r in out],
        key=lambda t: (t[0] is None, t),
    )
    assert vals == [("FAILURE", 2), ("SUCCESS", 1), (None, None)]


def test_unknown_function_is_loud():
    from grove_spark.functions.paths import compile_expr

    with pytest.raises(ValueError, match="unknown jmespath function"):
        compile_expr(SCHEMA, "bogus(events)")
    with pytest.raises(ValueError, match="arity"):
        compile_expr(SCHEMA, "length(events, id)")


def test_function_library_invalid_types_are_loud():
    """Type errors surface at COMPILE time (the library raises them per
    row at runtime); deviations that cannot be typed are documented
    loud errors, never silent wrong answers."""
    from grove_spark.functions.paths import compile_expr

    for bad in [
        "abs(outcome.result)",         # abs over string
        "sum(events)",                 # sum over array<struct>
        "sort(events)",                # sort needs atomic elements
        "join('-', metrics.*)",        # join needs array<string>
        "keys(id)",                    # keys over number
        "reverse(metrics)",            # reverse over object
        "merge(outcome, events)",      # merge of object + array
        "sort_by(events, &tags)",      # key must be number|string
        "map(&name, outcome)",         # map needs an array
    ]:
        with pytest.raises(ValueError):
            compile_expr(SCHEMA, bad)
    with pytest.raises(ValueError, match="literal"):
        compile_expr(SCHEMA, "join(outcome.result, events[*].name)")
    with pytest.raises(ValueError, match="expression-ref"):
        compile_expr(SCHEMA, "sort_by(events, name)")
    with pytest.raises(ValueError, match="arity"):
        compile_expr(SCHEMA, "sort_by(events)")


def test_to_string_composites_match_jmespath(df):
    """to_string over structs/arrays/maps == the library's compact JSON
    (nulls kept, quotes escaped) — checked row-for-row as strings."""
    from grove_spark.functions.paths import compile_expr

    exprs = ["to_string(outcome)", "to_string(events)",
             "to_string(events[0])", "to_string(metrics)",
             "to_string(events[*].name)", "to_string(events[0].tags)"]
    cols = [compile_expr(SCHEMA, e)[0].alias(f"e{i}")
            for i, e in enumerate(exprs)]
    got = {r["id"]: r for r in df.select(F.col("id"), *cols).collect()}
    for row in DICT_ROWS:
        for i, e in enumerate(exprs):
            want = jmespath.search(e, row)
            assert got[row["id"]][f"e{i}"] == want, (e, row["id"])


def test_filter_projections_match_jmespath(df):
    """[?path <op> literal] filter projections — string and nested-path
    comparisons, chained remainders, vs the library."""
    from grove_spark.functions.paths import compile_expr

    cases = [
        "events[?name == 'login'].name",
        "events[?name != 'login'].name",
        "events[?name == 'nosuch'].name",
        "events[?name == 'login'].tags",
        "events[?name >= 'logout'].name",
    ]
    cols = [compile_expr(SCHEMA, e)[0].alias(f"f{i}") for i, e in enumerate(cases)]
    got = df.select(F.col("id"), *cols).collect()
    for r in got:
        want_row = next(d for d in DICT_ROWS if d["id"] == r["id"])
        for i, e in enumerate(cases):
            assert _plain(r[f"f{i}"]) == _jp(e, want_row), f"{e} id={r['id']}"


def test_filter_projection_numeric_backtick_literal(spark):
    """Backtick literals are JSON (numbers), not strings — `2` filters
    numerically; a filter over a null array yields null."""
    import jmespath as jp

    from grove_spark.functions.paths import compile_expr

    schema = T.StructType([
        T.StructField("rows", T.ArrayType(T.StructType([
            T.StructField("n", T.LongType()),
            T.StructField("v", T.StringType()),
        ])))
    ])
    df = spark.createDataFrame(
        [([{"n": 1, "v": "a"}, {"n": 3, "v": "b"}, {"n": 5, "v": "c"}],), (None,)],
        schema,
    )
    expr = "rows[?n > `2`].v"
    col, t = compile_expr(schema, expr)
    got = [r["x"] for r in df.select(col.alias("x")).collect()]
    assert got[0] == jp.search(expr, {"rows": [{"n": 1, "v": "a"}, {"n": 3, "v": "b"}, {"n": 5, "v": "c"}]})
    assert got[0] == ["b", "c"] and got[1] is None
    assert isinstance(t, T.ArrayType)


def test_filter_projection_in_extract_and_unsupported_loud(df):
    out = extract_paths(
        df, [{"destination": "login_tags",
              "sources": ["events[?name == 'login'].tags"]}]
    ).collect()
    vals = [r["login_tags"] for r in out]
    assert [["a", "b"]] in vals

    from grove_spark.functions.paths import path_col

    with pytest.raises(ValueError, match="unsupported filter"):
        path_col("events[?name].tags")


def test_quoted_segment_stays_a_field_in_expressions(spark):
    """The reference's path grammar single-quotes literal FIELD names
    ('@timestamp'); routing sources/filters through compile_expr must
    not reread them as string literals (which made every such filter a
    constant and every such source an always-truthy literal)."""
    from grove_spark.functions.paths import compile_expr

    schema = T.StructType([
        T.StructField("@timestamp", T.StringType()),
        T.StructField("v", T.LongType()),
    ])
    df = spark.createDataFrame([("2024-05-05", 1), ("", 2)], schema)
    col, t = compile_expr(schema, "'@timestamp'")
    assert isinstance(t, T.StringType)
    got = [r["x"] for r in df.select(col.alias("x")).collect()]
    assert got == ["2024-05-05", ""], "quoted field read as a string literal"
    # extract source: the FIELD's per-row values must come through (a
    # literal would be the same truthy constant for every row)
    out = extract_paths(df, [
        {"destination": "ts", "sources": ["'@timestamp'"]}
    ]).collect()
    assert sorted(r["ts"] for r in out) == ["", "2024-05-05"]
    # an UNRESOLVABLE quoted expression is still a string literal
    col2, _ = compile_expr(schema, "'no such field'")
    assert df.select(col2.alias("x")).first()["x"] == "no such field"


def test_malformed_bracket_syntax_is_loud():
    """Nested filters like a[?tags[0] == 'x'] now PARSE (the bracket
    scanner); genuinely malformed syntax must still fail loudly."""
    from grove_spark.functions.paths import path_col

    path_col("a[?tags[0] == 'x'].name")  # supported since the scanner
    path_col("a[1:9:2]")  # stepped slices compile since round 4
    with pytest.raises(ValueError, match="unparseable index"):
        path_col("a[?tags[0 == 'x'].name")  # unbalanced bracket
    with pytest.raises(ValueError, match="unparseable index"):
        path_col("a[0]junk.name")  # trailing garbage after a group
    with pytest.raises(ValueError, match="step cannot be 0"):
        path_col("a[1:9:0]")
    with pytest.raises(ValueError, match="unsupported slice"):
        path_col("a[1:2:3:4]")


def test_multiselect_quoted_key_and_slice_value(df):
    from grove_spark.functions.paths import compile_expr

    col, t = compile_expr(SCHEMA, "{'a:b': outcome.result, cut: events[0:1].name}")
    row = df.where("id = 1").select(col.alias("m")).first()["m"]
    assert row["a:b"] == "FAILURE"
    assert list(row["cut"]) == ["login"]


def test_empty_string_literal_and_stepped_slice_message(spark, df):
    """'' is the empty-string LITERAL (not a field trial / IndexError);
    stepped slices report a slice-specific error."""
    from grove_spark.functions.paths import compile_expr, path_col

    col, t = compile_expr(SCHEMA, "''")
    assert isinstance(t, T.StringType)
    assert df.select(col.alias("x")).first()["x"] == ""
    # the constant-fallback idiom: last source is an empty literal
    out = extract_paths(df, [
        {"destination": "r", "sources": ["outcome.result", "''"]}
    ]).collect()
    assert sorted(r["r"] or "" for r in out) == ["", "FAILURE", "SUCCESS"]
    # double quotes force a literal even when a same-named field exists
    col2, _ = compile_expr(SCHEMA, '"id"')
    assert df.select(col2.alias("x")).first()["x"] == "id"
    with pytest.raises(ValueError, match="step cannot be 0"):
        path_col("a[1:9:0]")


def test_object_wildcard_semantics(spark, df):
    """Heterogeneous structs are a loud documented deviation; maps
    project their values; non-objects compile to jmespath-null."""
    from grove_spark.functions.paths import compile_expr

    with pytest.raises(ValueError, match="heterogeneous"):
        compile_expr(SCHEMA, "outcome.*")
    with pytest.raises(ValueError, match="heterogeneous"):
        compile_expr(SCHEMA, "events[0].*")

    # non-object operand: compile_expr -> None == null for every row,
    # matching the library
    assert compile_expr(SCHEMA, "id.*") is None
    assert jmespath.search("id.*", DICT_ROWS[0]) is None
    assert compile_expr(SCHEMA, "events.*") is None
    assert jmespath.search("events.*", DICT_ROWS[0]) is None

    # map values: * projects over values (the dict analog the library
    # sees every time)
    mschema = T.StructType([
        T.StructField("m", T.MapType(T.StringType(), T.LongType())),
    ])
    mdf = spark.createDataFrame([({"a": 1, "b": 2},), (None,)], mschema)
    col, t = compile_expr(mschema, "m.*")
    got = [r["x"] for r in mdf.select(col.alias("x")).collect()]
    assert sorted(got[0]) == [1, 2] and got[1] is None
    assert isinstance(t, T.ArrayType) and isinstance(t.elementType, T.LongType)
    # remainder projects over the values
    col2, _ = compile_expr(mschema, "length(m.*)")
    assert mdf.select(col2.alias("x")).first()["x"] == 2

    # top-level * over a homogeneous row
    hschema = T.StructType([
        T.StructField("a", T.LongType()), T.StructField("b", T.LongType()),
    ])
    hdf = spark.createDataFrame([(1, 2)], hschema)
    col3, t3 = compile_expr(hschema, "*")
    assert jmespath.search("*", {"a": 1, "b": 2}) == [1, 2]
    assert list(hdf.select(col3.alias("x")).first()["x"]) == [1, 2]


def test_schema_less_flatten_is_loud_everywhere():
    """Review regression: path_col('a[*].b[]') without a schema used to
    silently return NESTED arrays (jmespath flattens); both the direct
    and the in-projection flat must raise the same loud contract."""
    from grove_spark.functions.paths import path_col

    with pytest.raises(ValueError, match="flatten"):
        path_col("a[].b")
    with pytest.raises(ValueError, match="flatten"):
        path_col("a[*].b[]")
    # with the schema, both compile (and parity is covered by the
    # jmespath-library suite)
    import pyspark.sql.types as T
    schema = T.StructType([T.StructField("a", T.ArrayType(T.StructType([
        T.StructField("b", T.ArrayType(T.LongType()))])))])
    path_col("a[].b", schema)
    path_col("a[*].b[]", schema)


# ---------------------------------------------------------------------------
# randomized expression generation over the SUPPORTED grammar — every
# generated expression must match the public jmespath library (not just
# the curated EXPRS list)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

_EV_PRED = st.sampled_from([
    "name == 'login'", "name != 'read'", "tags", "!tags",
    "contains(tags, 'c')", "length(tags) >= `1`",
    "name == 'login' || name == 'logout'",
    "(name == 'read') && tags", "!(name == 'login')",
    "tags[?@ == 'a']",
    # null-safe equality (jmespath: null == null true, null != x true)
    "tags[0] == `null`", "tags[0] != `null`", "tags[0] != 'a'",
])
_EV_SUFFIX = st.one_of(
    st.just(""),
    st.sampled_from(["[0]", "[-1]", "[2]", "[*]", "[]", "[0:2]", "[1:]",
                     "[:1]", "[-2:]",
                     "[::2]", "[::-1]", "[1::2]", "[-1::-1]", "[::-2]"]),
    _EV_PRED.map(lambda p: f"[?{p}]"),
)
_TAG_SUFFIX = st.sampled_from(
    ["", "[0]", "[-1]", "[*]", "[]", "[0:1]", "[?@ == 'a']",
     "[::-1]", "[::2]"]
)
_PROJECTING = ("[*]", "[]", "[0:2]", "[1:]", "[:1]", "[-2:]",
               "[::2]", "[::-1]", "[1::2]", "[-1::-1]", "[::-2]")


def _compose(s, l):
    # one documented deviation excluded from generation: a bracket
    # FILTER chained after a projection binds to the realized outer
    # list in jmespath.py (Pratt-precedence artifact) but per-element
    # here. (Per-element null INDEX results are no longer excluded —
    # projections drop nulls, matching the library.)
    if (s.startswith("[?") or s in _PROJECTING) and "[?" in l:
        l = ".name"
    return "events" + s + l


_LEAF = st.one_of(
    st.just(""),
    st.just(".name"),
    _TAG_SUFFIX.map(lambda t: ".tags" + t),
)
_BASE = st.builds(_compose, _EV_SUFFIX, _LEAF)
_PIPE_RHS = st.sampled_from(["[0]", "[-1]", "[0:1]", "length(@)",
                             "[::-1]", "[::2]"])
# function calls composed with trailing paths / ops / pipes — the
# continuation parser must route every suffix over the call's result
_FN_BASE = st.sampled_from([
    "sort_by(events, &name)", "map(&name, events)",
    "map(&tags, events)", "reverse(events[*].name)",
    "sort(events[*].name)", "to_array(events[0].name)",
])
_FN_SUFFIX = st.sampled_from([
    "", "[0]", "[-1]", "[0:1]", "[::-1]", " | [0]", " | length(@)",
])
_FN_EXPR = st.builds(lambda f, s: f + s, _FN_BASE, _FN_SUFFIX)
_EXPR = st.one_of(
    _BASE,
    st.builds(lambda e, p: f"{e} | {p}", _BASE, _PIPE_RHS),
    _FN_EXPR,
    st.sampled_from(["outcome.result", "outcome.score", "id",
                     "length(events)", "{r: outcome.result, n: id}",
                     "metrics.*", "metrics.* | [0]", "length(metrics.*)",
                     "metrics.* | [::-1]", "metrics.lat", "metrics.cnt",
                     # function library (well-typed forms; type errors are
                     # compile-time-loud by design, so the grammar sticks
                     # to operands the library also accepts)
                     "sum(metrics.*)", "avg(metrics.*)", "min(metrics.*)",
                     "sort(events[*].name)", "reverse(events[*].name)",
                     "join('-', events[*].name)", "keys(metrics)",
                     "values(metrics)", "to_string(metrics.cnt)",
                     "to_string(outcome)", "to_string(events[0])",
                     "to_string(events[*].name)", "to_string(metrics)",
                     "type(events)", "type(outcome)", "type(missing)",
                     "not_null(missing, outcome.result)",
                     "map(&name, events)", "map(&tags[0], events)",
                     "sort_by(events, &name)[*].name",
                     "min_by(events, &name).name",
                     "max_by(events, &name).name",
                     "merge(outcome, metrics)"]),
)


# (the former _lenient normalizer is gone: projections now DROP null
# per-element results exactly like the library, so the fuzz compares
# raw values with no normalization)


@given(exprs=st.lists(_EXPR, min_size=1, max_size=12, unique=True))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_randomized_expressions_match_jmespath(df, exprs):
    from grove_spark.functions.paths import compile_expr

    cols, live = [], []
    for i, e in enumerate(exprs):
        # a pipe whose LHS projection is typed array<null> (e.g. only
        # null elements possible) may not compile a RHS — compile_expr
        # returning None means jmespath-null for every row
        sub = compile_expr(SCHEMA, e)
        if sub is None:
            for row in DICT_ROWS:
                assert _jp(e, row) is None, e
            continue
        cols.append(sub[0].alias(f"e{i}"))
        live.append((i, e))
    assume(live)
    got = df.select(F.col("id"), *[c for c in cols]).collect()
    for r in got:
        want_row = next(d for d in DICT_ROWS if d["id"] == r["id"])
        for i, e in live:
            want = _jp(e, want_row)
            have = _plain(r[f"e{i}"])
            if want is None and isinstance(have, dict):
                assert all(v is None for v in have.values()), e
                continue
            assert have == want, (
                f"{e} on id={r['id']}: spark={have} jmespath={want}"
            )
