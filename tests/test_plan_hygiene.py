"""Plan hygiene — the 100 TB survival checks (SURVEY §7 hard part (e)).

These assert properties of the *physical plan*, not results:
* no row-at-a-time Python (``BatchEvalPython``) anywhere; Arrow-vectorized
  UDFs (``ArrowEvalPython``) only in the opt-in arrow parse stage;
* watermark predicates reach the parquet scan (PushedFilters);
* dim joins broadcast (no SortMergeJoin for sources/sinks);
* the processor chain stays inside whole-stage codegen.
"""

import pytest

from grove_spark.fixtures.generator import write_fixture
from grove_spark.plans.pipeline import build_pipeline
from grove_spark.plans.parse import parse_stage


@pytest.fixture(scope="module")
def loaded(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("hygiene")
    paths = write_fixture(str(d), 200)
    return (
        spark.read.parquet(paths["sequences"]),
        spark.read.parquet(paths["sources"]),
        spark.read.parquet(paths["sinks"]),
    )


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_no_per_row_python_in_pipeline(spark, loaded):
    seq, sources, sinks = loaded
    res = build_pipeline(seq, sources, sinks, n_partitions=4)
    plan = plan_of(res.routed)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan  # catalyst parse has no Python at all


def test_arrow_parse_is_vectorized_not_row(spark, loaded):
    seq, _, _ = loaded
    plan = plan_of(parse_stage(seq, engine="arrow"))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_watermark_filter_pushed_to_scan(spark, loaded):
    seq, sources, sinks = loaded
    res = build_pipeline(
        seq, sources, sinks, watermark="2024-01-01 00:00:30", n_partitions=4
    )
    plan = plan_of(res.routed)
    assert "PushedFilters: [IsNotNull(event_time)" in plan or "GreaterThan(event_time" in plan


def test_dim_joins_broadcast(spark, loaded):
    seq, sources, sinks = loaded
    res = build_pipeline(seq, sources, sinks, n_partitions=4)
    plan = plan_of(res.routed)
    assert plan.count("BroadcastHashJoin") >= 2  # sources + sinks dims
    assert "SortMergeJoin" not in plan


def test_column_pruning_reaches_scan(spark, loaded):
    seq, _, _ = loaded
    narrow = seq.select("doc_id", "n_tok")
    plan = plan_of(narrow)
    # ReadSchema must not include tokens/raw for a 2-column projection
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "tokens" not in read_schema[0] and "raw" not in read_schema[0]


def test_chain_single_codegen_stage(spark):
    """A 3-processor chain compiles into one codegen span (no exchange,
    no Python boundary)."""
    import pyspark.sql.types as T

    from grove_spark.operators import apply_chain

    schema = T.StructType([
        T.StructField("a", T.StringType()),
        T.StructField("vals", T.ArrayType(T.StringType())),
    ])
    df = spark.createDataFrame([("x", ["1", "2"])], schema=schema)
    out = apply_chain(df, [
        {"processor": "split_path", "source": "vals"},
        {"processor": "filter_entries", "filters": ["sql:vals = '1'"]},
        {"processor": "extract_paths", "fields": [
            {"destination": "v", "sources": ["vals"]}]},
    ])
    plan = plan_of(out)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_fleet_plan_hygiene(spark, loaded):
    """assemble_fleet over mixed chains: all-broadcast, no Python,
    per-branch source sets pushed to the scan."""
    from grove_spark.config import ConnectorConfig, assemble_fleet

    seq, _, _ = loaded
    cfgs = [
        ConnectorConfig.from_dict({"connector": "okta_system_log", "identity": "a", "source": "okta"}),
        ConnectorConfig.from_dict({
            "connector": "gsuite_activities", "identity": "c", "source": "gsuite",
            "processors": [{"processor": "filter_entries", "filters": ["sql:n_tok < 20"]}],
        }),
    ]
    routed = assemble_fleet(spark, cfgs, seq)
    plan = plan_of(routed)
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "In(source" in plan or "EqualTo(source" in plan  # pushed source filter
