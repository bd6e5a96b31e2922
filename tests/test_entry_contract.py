"""Driver-contract smoke: entry() runs, queries()/oracle_sql() stay in
sync, and a fast subset matches DuckDB at sf0.001 (the full gate runs in
tools/check_correctness.py at sf0.01)."""

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

FAST = ["route_counts", "dedup_pointer", "enrich_broadcast", "sink_telemetry",
        "quality_score", "ann_bruteforce"]


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"descriptor", "n_rows", "sum_chars"}


def test_query_oracle_keys_in_sync():
    qs, oracle = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracle) <= set(qs)
    # only declared sketch/approx ops may lack an oracle (rows-only check)
    from grove_spark.queries import NO_ORACLE

    missing = set(qs) - set(oracle)
    assert missing == NO_ORACLE, f"undeclared oracle-less queries: {missing - NO_ORACLE}"


def test_catalog_rows_documented_in_coverage():
    """Gate self-audit (VERDICT r4 #10): at 79+ rows a dead or
    undocumented catalog entry could hide — every QUERIES name must have
    an ORACLE twin (above) AND appear in COVERAGE.md's operator map."""
    import pathlib

    cov = (pathlib.Path(__file__).parent.parent / "COVERAGE.md").read_text()
    undocumented = sorted(k for k in entrymod.queries() if k not in cov)
    assert not undocumented, f"gate rows absent from COVERAGE.md: {undocumented}"


def canon(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.9g}"
    return "\0" if v is None else str(v)


@pytest.mark.parametrize("name", FAST)
def test_query_matches_duckdb(spark, sf_dir, name):
    qs, oracle = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, sf_dir)
    srows = {tuple(canon(v) for v in r) for r in sdf.collect()}
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    res = con.execute(oracle[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    # align column order by name
    idx = [ocols.index(c) for c in sdf.columns]
    orows = {tuple(canon(r[i]) for i in idx) for r in orows}
    assert srows == orows
