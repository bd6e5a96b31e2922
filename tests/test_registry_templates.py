"""Fleet-scale registry + verbatim reference-template compatibility.

* the 44-connector registry (grove_spark/registry.py, transcribed from
  the reference's entry-point registry pyproject.toml:67-111) builds a
  broadcast dimension and a full-width fleet plan;
* every shipped reference config template under
  templates/configuration/** loads UNCHANGED through load_configs and
  its processor chain compiles through apply_chain — including the
  chained gsuite flattened_drive_activities template, checked against a
  golden output.
"""

import os

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from grove_spark.config import ConnectorConfig, assemble_fleet, load_configs
from grove_spark.operators.processors import apply_chain
from grove_spark.registry import BY_NAME, CONNECTORS, default_config_doc, registry_dim

REF_TEMPLATES = "/root/reference/templates/configuration"


def test_registry_is_full_width():
    assert len(CONNECTORS) == 44
    assert len({c.connector for c in CONNECTORS}) == 44
    kinds = {c.pointer_kind for c in CONNECTORS}
    assert kinds == {"timestamp", "sequence", "cursor", "date"}
    # the numeric-sequence pointer that motivates typed watermarks
    assert BY_NAME["zitadel_events"].pointer_path == "sequence"
    assert BY_NAME["okta_system_log"].log_order == "CHRONOLOGICAL"
    assert BY_NAME["slack_audit_logs"].log_order == "REVERSE_CHRONOLOGICAL"


def test_registry_dim_and_full_width_fleet_plan(spark, tmp_path):
    dim = registry_dim(spark)
    assert dim.count() == 44

    from grove_spark.fixtures.generator import write_fixture

    paths = write_fixture(str(tmp_path / "fx"), 400)
    seq = spark.read.parquet(paths["sequences"])
    cfgs = [ConnectorConfig.from_dict(default_config_doc(c.connector)) for c in CONNECTORS]
    # give four of them a processor chain so the fleet mixes branches
    for c in cfgs[:4]:
        c.processors = [{"processor": "filter_entries", "filters": ["sql:n_tok < 20"]}]
    routed = assemble_fleet(spark, cfgs, seq)
    plan = routed._sc._jvm.PythonSQLUtils.explainString(
        routed._jdf.queryExecution(), "formatted"
    )
    # 44 connectors collapse into per-chain branches, all broadcast, no
    # Python — the whole fleet is ONE plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan
    # executable end-to-end (sources not in the fixture contribute 0 rows)
    assert routed.groupBy("connector").count().count() <= 44


@pytest.mark.skipif(not os.path.isdir(REF_TEMPLATES), reason="reference not mounted")
def test_reference_templates_load_verbatim():
    cfgs = load_configs(REF_TEMPLATES)
    assert len(cfgs) >= 40
    known = {c.connector for c in cfgs} & set(BY_NAME)
    assert len(known) >= 35  # template set covers most of the registry
    for c in cfgs:
        assert c.connector  # identity may be an empty placeholder in templates
        assert set(c.outputs) <= {"logs", "processed"}


@pytest.mark.skipif(not os.path.isdir(REF_TEMPLATES), reason="reference not mounted")
def test_flattened_drive_activities_template_golden(spark):
    """The one shipped template with a processor chain
    (templates/configuration/gsuite/flattened_drive_activities.json:
    split_path over events, zip_paths over events.parameters) runs
    verbatim over a gsuite-activities-shaped frame."""
    cfgs = load_configs(os.path.join(REF_TEMPLATES, "gsuite"))
    cfg = next(c for c in cfgs if c.processors)

    param_t = T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("boolValue", T.BooleanType()),
        T.StructField("multiValue", T.ArrayType(T.StringType())),
    ])
    schema = T.StructType([
        T.StructField("id", T.StructType([T.StructField("time", T.StringType())])),
        T.StructField("actor", T.StringType()),
        T.StructField("events", T.ArrayType(T.StructType([
            T.StructField("type", T.StringType()),
            T.StructField("parameters", T.ArrayType(param_t)),
        ]))),
    ])
    rows = [
        (
            {"time": "2024-01-01T00:00:00Z"},
            "alice",
            [
                {"type": "access", "parameters": [
                    {"name": "doc_title", "value": "Q1 plan", "boolValue": None, "multiValue": None},
                    {"name": "billable", "value": None, "boolValue": True, "multiValue": None},
                ]},
                {"type": "acl_change", "parameters": [
                    {"name": "visibility", "value": None, "boolValue": None,
                     "multiValue": ["people_with_link"]},
                ]},
            ],
        ),
    ]
    df = spark.createDataFrame(rows, schema=schema)
    out = apply_chain(df, cfg.processors).collect()

    # split_path fanned 1 entry -> 2 (one per event); zip_paths turned
    # each event's parameter list into a map with first-non-null values
    assert len(out) == 2
    by_type = {r["events"]["type"]: r["events"]["parameters"] for r in out}
    assert by_type["access"]["doc_title"] == "Q1 plan"
    assert by_type["access"]["billable"] == "true"
    assert by_type["acl_change"]["visibility"] in ("[people_with_link]", "people_with_link")
    # actor and id survive untouched on every fanned row
    assert all(r["actor"] == "alice" and r["id"]["time"] == "2024-01-01T00:00:00Z" for r in out)
