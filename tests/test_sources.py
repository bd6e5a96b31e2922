"""Source shapes: incremental watermark scan, consistency-delay ceiling,
CSV log scan, config scan with disabled-drop."""

import datetime as dt
import json

import pytest

from grove_spark.sources.scans import (
    config_scan,
    csv_log_scan,
    heartbeat,
    incremental_scan,
)


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory, sf_dir):
    return f"{sf_dir}/events.parquet"


def test_incremental_scan_watermark(spark, events_path):
    full = spark.read.parquet(events_path).count()
    inc = incremental_scan(spark, events_path, "ts", watermark="2024-01-03 00:00:00")
    n = inc.count()
    assert 0 < n < full
    assert inc.agg({"ts": "min"}).first()[0] > dt.datetime(2024, 1, 3)


def test_consistency_delay_ceiling(spark, events_path):
    """S2/T6: end = now - delay (github/audit_log.py:121); rows inside
    the delay window are withheld until a later run."""
    now = dt.datetime(2024, 1, 2, 0, 0, 0, tzinfo=dt.timezone.utc)
    delayed = incremental_scan(
        spark, events_path, "ts", delay_s=3600, now=now
    )
    mx = delayed.agg({"ts": "max"}).first()[0]
    assert mx <= dt.datetime(2024, 1, 1, 23, 0, 0)
    # without delay the same scan reaches later rows
    undelayed = incremental_scan(spark, events_path, "ts")
    assert undelayed.agg({"ts": "max"}).first()[0] > mx


def test_csv_log_scan(spark, tmp_path):
    """S7: SalesForce event logs arrive as CSV; rows at/before the
    pointer are dropped (sf/event_log.py:190-200)."""
    p = tmp_path / "log.csv"
    p.write_text(
        "TIMESTAMP_DERIVED,EVENT_TYPE,USER\n"
        "2024-01-01T00:00:01Z,Login,a\n"
        "2024-01-01T00:00:02Z,Logout,b\n"
        "2024-01-01T00:00:03Z,Login,c\n"
    )
    out = csv_log_scan(spark, str(p), "TIMESTAMP_DERIVED",
                       watermark="2024-01-01T00:00:01Z")
    rows = out.collect()
    assert sorted(r["USER"] for r in rows) == ["b", "c"]


def test_config_scan_drops_disabled(spark, tmp_path):
    (tmp_path / "a.json").write_text(json.dumps(
        {"connector": "okta_system_log", "identity": "x", "disabled": False}))
    (tmp_path / "b.json").write_text(json.dumps(
        {"connector": "dead", "identity": "y", "disabled": True}))
    out = config_scan(spark, str(tmp_path))
    assert [r["connector"] for r in out.collect()] == ["okta_system_log"]


def test_heartbeat_shape(spark):
    rows = heartbeat(spark, n=3).collect()
    assert len(rows) == 3
    assert all(r["type"] == "heartbeat" for r in rows)
    assert [r["sequence"] for r in rows] == [0, 1, 2]


def test_lookback_rescan_widens_window(spark, tmp_path):
    """T6 late_buffer re-scan (bigquery_query.py:241-260): lookback_s
    widens the lower bound; the overlap is re-read for hash dedup."""
    import datetime as dt

    from grove_spark.sources.scans import incremental_scan

    rows = [(dt.datetime(2024, 1, 1, 0, 0, s), f"d{s}") for s in (10, 20, 30, 40)]
    df = spark.createDataFrame(rows, "ts timestamp, doc string")
    df.write.mode("overwrite").parquet(str(tmp_path / "t"))

    plain = incremental_scan(spark, str(tmp_path / "t"), "ts",
                             watermark="2024-01-01 00:00:30")
    assert {r["doc"] for r in plain.collect()} == {"d40"}

    widened = incremental_scan(spark, str(tmp_path / "t"), "ts",
                               watermark="2024-01-01 00:00:30", lookback_s=15)
    assert {r["doc"] for r in widened.collect()} == {"d20", "d30", "d40"}


def test_ndjson_gzip_roundtrip(spark, tmp_path):
    """O1 sink output reads back losslessly through ndjson_scan (gzip
    codec picked up from the file extension)."""
    from grove_spark.operators.sinks import write_gzip_ndjson
    from grove_spark.sources.scans import ndjson_scan

    df = spark.createDataFrame(
        [(1, "a", [1, 2]), (2, None, [])],
        "id long, v string, toks array<int>",
    )
    out = str(tmp_path / "ndjson")
    write_gzip_ndjson(df, out)
    import glob

    assert glob.glob(f"{out}/*.gz"), "output must be gzip-compressed"
    back = ndjson_scan(spark, out, schema=df.schema)
    assert sorted(r.asDict(recursive=True).items() for r in back.collect()) == sorted(
        r.asDict(recursive=True).items() for r in df.collect()
    )
    filtered = ndjson_scan(spark, out, pointer_col="id", watermark="1", schema=df.schema)
    assert [r["id"] for r in filtered.collect()] == [2]


def test_jdbc_pull_scan_executes_against_embedded_derby(spark, tmp_path):
    """S5 executed for real: write a Derby table over JDBC, pull it back
    through the typed-watermark subquery as a partitioned read."""
    from grove_spark.sources.scans import jdbc_pull_scan

    spark._jvm.System.setProperty("derby.stream.error.file", "/tmp/grove_derby.log")
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    df = spark.range(100).selectExpr(
        "id AS event_id", "CAST(id % 5 AS INT) AS k", "concat('u', id) AS name"
    )
    (
        df.coalesce(1).write.format("jdbc")
        .option("url", url).option("dbtable", "t").save()
    )
    out = jdbc_pull_scan(
        spark, url, "SELECT * FROM t", "event_id",
        watermark="49", pointer_kind="sequence",
    )
    assert out.count() == 50
    assert out.agg({"event_id": "min"}).first()[0] == 50
    # partitioned read splits into num_partitions JDBC range queries
    part = jdbc_pull_scan(
        spark, url, "SELECT * FROM t", "event_id",
        watermark="49", pointer_kind="sequence",
        partition_col='"event_id"', bounds=(50, 100), num_partitions=4,
    )
    assert part.count() == 50
    assert part.rdd.getNumPartitions() == 4
    # cursor kind needs a comparable VARCHAR: CAST in the pull query
    # (Spark's Derby writer maps StringType -> CLOB)
    cur = jdbc_pull_scan(
        spark, url,
        'SELECT "event_id", CAST("name" AS VARCHAR(64)) AS "name" FROM t',
        "name", watermark="u50", pointer_kind="cursor",
    )
    assert cur.count() > 0


def test_jdbc_pull_scan_rejects_bad_watermarks():
    from grove_spark.sources.scans import jdbc_pull_scan

    with pytest.raises(ValueError, match="not numeric"):
        jdbc_pull_scan(None, "u", "SELECT 1", "c", watermark="49; DROP TABLE t",
                       pointer_kind="sequence")
    with pytest.raises(ValueError):
        jdbc_pull_scan(None, "u", "SELECT 1", "c", watermark="not-a-time",
                       pointer_kind="timestamp")
    with pytest.raises(ValueError, match="bare identifier"):
        jdbc_pull_scan(None, "u", "SELECT 1", 'c"; DROP', watermark="1",
                       pointer_kind="sequence")


def test_orc_log_scan_roundtrip_and_pushdown(spark, tmp_path):
    from grove_spark.sources.scans import orc_log_scan

    d = str(tmp_path / "orc")
    spark.range(1000).selectExpr("id AS seq", "concat('e', id % 7) AS et") \
        .write.orc(d)
    out = orc_log_scan(spark, d, "seq", watermark="499")
    assert out.count() == 500
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(seq" in plan
