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


def _pushed_filters(plan: str) -> str:
    """Concatenated PushedFilters lines of a formatted plan."""
    return " ".join(ln for ln in plan.splitlines() if "PushedFilters:" in ln)


def test_watermark_filter_pushed_to_scan(spark, loaded):
    """The GreaterThan must be INSIDE PushedFilters — an IsNotNull-only
    pushdown means every incremental run re-reads the full table. (The
    round-1 version of this test accepted IsNotNull alone, which let the
    cast-the-column watermark bug ship.)"""
    seq, sources, sinks = loaded
    res = build_pipeline(
        seq, sources, sinks, watermark="2024-01-01 00:00:30", n_partitions=4
    )
    pushed = _pushed_filters(plan_of(res.routed))
    assert "GreaterThan(event_time" in pushed, pushed


def test_numeric_pointer_watermark_pushes_and_orders(spark):
    """Zitadel-style monotonic sequence pointers (grove/connectors/
    zitadel/events.py:22): pointer '9' must keep seq 10 (numeric order,
    not string order where '10' < '9'), and the GreaterThan must push."""
    from grove_spark.operators.dedup import dedup_by_pointer

    df = spark.createDataFrame([(9,), (10,), (100,)], "seq long")
    out = dedup_by_pointer(df, "seq", "9")
    assert sorted(r["seq"] for r in out.collect()) == [10, 100]

    # pushdown check needs a file scan
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/t")
        scan = dedup_by_pointer(spark.read.parquet(f"{d}/t"), "seq", "9")
        pushed = _pushed_filters(plan_of(scan))
        assert "GreaterThan(seq,9)" in pushed, pushed


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


def test_minhash_verify_has_no_allpairs_shingle_join(spark):
    """LSH verification must be O(candidates): the plan may group shingles
    per candidate doc, but must never self-join the shingle column (the
    all-pairs inverted-index cost LSH exists to avoid)."""
    import re

    from grove_spark.operators.dedup_fuzzy import minhash_dedup_pairs

    docs = spark.createDataFrame(
        [("d1", "a b c d e f"), ("d2", "a b c d e g")], "doc_id string, text string"
    )
    plan = plan_of(minhash_dedup_pairs(docs, verify=True))
    joins = re.findall(r"(?:Join|BroadcastHashJoin|SortMergeJoin).*", plan)
    assert not any(re.search(r"shingle#\d+ = shingle#", j) for j in joins), joins
    assert "array_intersect" in plan  # per-candidate exact verify


def test_fleet_watermark_pushes_numeric_and_timestamp(spark, loaded):
    """assemble_fleet's per-connector predicates must reach the scan as
    typed GreaterThans (not post-scan string casts)."""
    from grove_spark.config import ConnectorConfig, assemble_fleet

    seq, _, _ = loaded
    cfgs = [
        ConnectorConfig.from_dict({"connector": "okta_system_log", "identity": "a", "source": "okta"}),
    ]
    wm = {cfgs[0].reference(): "2024-01-01 00:00:30"}
    routed = assemble_fleet(spark, cfgs, seq, watermarks=wm)
    pushed = _pushed_filters(plan_of(routed))
    assert "GreaterThan(event_time" in pushed, pushed


def test_every_gate_query_is_python_free(spark):
    """Blanket sweep: NO gate query's plan may contain row-at-a-time
    Python (BatchEvalPython). Arrow kernels (MapInPandas — the batched
    matmul in ann_ivf) are the only sanctioned Python, and only there."""
    from grove_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    # batched numpy kernels, by design: ann_ivf's matmul and the real
    # media codecs (encode/decode is inherently per-blob Python — Arrow
    # batched, never row-at-a-time)
    allowed_arrow = {"ann_ivf", "ann_ivf_indexed", "bmp_decode",
                     "wav_decode", "png_decode", "jpeg_decode",
                     # BPE encode: iterative merge walk, Arrow-batched
                     # with per-executor piece memo (decode IS Catalyst)
                     "bpe_tokenize",
                     # r6: gram hashing + the MinHash seed family run as
                     # vectorized xxh64 Arrow kernels (bit-identical to
                     # the Catalyst spec — test_dedup_fuzzy parity
                     # suite); measured 8x+ on the 1M-doc legs
                     "minhash_lsh", "decontaminate"}
    for name, fn in QUERIES.items():
        if name == "stream_tumbling":
            continue  # executes a streaming query; covered by its own test
        df = fn(spark, sf)
        plan = plan_of(df)
        assert "BatchEvalPython" not in plan, f"{name} has per-row Python"
        if name not in allowed_arrow:
            assert (
                "MapInPandas" not in plan
                and "MapInArrow" not in plan
                and "ArrowEvalPython" not in plan
            ), f"{name} uses Python unexpectedly"


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


def test_lsh_candidates_plan_shape(spark):
    """Lock the shuffle-optimal candidate plan (r5): the collect_list
    aggregate must sit DIRECTLY on the cap join's output — both share
    the (band, bucket) partitioning, so an exchange between them means
    a regression re-shuffling the 16M-row band stream; and the pair
    expansion must be the in-bucket transform, not a band-stream
    self-join."""
    from grove_spark.operators.dedup_fuzzy import (
        lsh_candidate_pairs, minhash_signatures)

    docs = spark.createDataFrame(
        [(i, f"a b c d e f g h i{i}") for i in range(100)],
        "doc_id: long, text: string",
    )
    sigs = minhash_signatures(docs, 64, 3)
    pairs = lsh_candidate_pairs(sigs, 16, 4, max_bucket_size=1000)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    # find the final collect_list aggregate; walk down past its partial
    # twin — the next plan node must be the join, NOT an Exchange
    idx = [i for i, ln in enumerate(lines)
           if "collect_list" in ln and "partial" not in ln]
    assert idx, "collect_list aggregate missing — expansion path not taken"
    below = "\n".join(lines[idx[0]:idx[0] + 3])
    assert "partial_collect_list" in below, "map-side combine missing"
    assert "Exchange" not in below, (
        "exchange between the cap join and the collect aggregate — "
        "partitioning reuse regressed:\n" + below
    )
    assert "BatchEvalPython" not in plan
