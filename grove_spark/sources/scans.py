"""Incremental sources (SURVEY §2.1 S1-S10).

Every one of the reference's 44 paginated-API connectors reduces, in a
set-oriented engine, to ONE primitive: a scan with an exact incremental
predicate derived from run-state, plus per-source quirks expressed as
plan options. The paging loops, Link-header cursors, keyset pagination
and lookback windows (okta/api.py:47-85, google/bigquery_query.py:262-359)
are all obsolete: the storage layer prunes files/partitions from the
watermark predicate and Spark scans the remainder in parallel.

Covered source shapes:
* parquet/Iceberg-style table scan with watermark (S1/S3/S4/S6)
* time-window scan with consistency delay (S2: `end = now - delay`)
* CSV log-file scan (S7: SalesForce event logs arrive as CSV)
* JSON config scan -> broadcast dimension (S10)
* generator/heartbeat source (S8: spark.range)
* JDBC pull scan (S5) — plan builder provided, exercised only when a
  JDBC driver is on the classpath (none in this sandbox)
"""

from __future__ import annotations

import datetime as dt
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def incremental_scan(
    spark: SparkSession,
    path: str,
    pointer_col: str,
    watermark: Optional[str] = None,
    delay_s: int = 0,
    now: Optional[dt.datetime] = None,
    fmt: str = "parquet",
    lookback_s: int = 0,
) -> DataFrame:
    """Watermarked incremental scan with optional consistency delay and
    lookback re-scan.

    ``watermark`` (exclusive lower bound) comes from run-state; ``delay_s``
    imposes the reference's late-data ceiling ``end = now - delay``
    (github/audit_log.py:121, bigquery_query.py:106). ``lookback_s``
    widens the lower bound to ``watermark - lookback`` (the BigQuery
    ``late_buffer_days`` re-scan, bigquery_query.py:241-260) — rows in
    the overlap are re-read and must be deduplicated downstream by
    content hash (dedup_by_hash with window-wide seen state). All
    predicates push down to the file scan (PushedFilters)."""
    from grove_spark.operators.dedup import watermark_literal

    df = spark.read.format(fmt).load(path)
    if watermark is not None:
        # literal cast to the column's native type: pushdown survives and
        # numeric sequence pointers order numerically, not as strings
        lo = watermark_literal(df, pointer_col, watermark)
        if lookback_s > 0:
            from pyspark.sql import types as T

            if isinstance(df.schema[pointer_col].dataType, T.NumericType):
                # sequence-kind pointers: lookback is in pointer units
                lo = lo - F.lit(lookback_s)
            else:
                lo = lo - F.expr(f"INTERVAL {lookback_s} SECONDS")
        df = df.where(F.col(pointer_col) > lo)
    if delay_s > 0:
        now = now or dt.datetime.now(dt.timezone.utc)
        ceiling = (now - dt.timedelta(seconds=delay_s)).replace(tzinfo=None)
        df = df.where(F.col(pointer_col) <= F.lit(ceiling.strftime("%Y-%m-%d %H:%M:%S.%f")))
    return df


def csv_log_scan(
    spark: SparkSession,
    path: str,
    pointer_col: str,
    watermark: Optional[str] = None,
    header: bool = True,
    schema=None,
) -> DataFrame:
    """CSV event-log scan (S7 — sf/event_log.py:190-200 dict-ifies rows;
    the pointer filter is a real predicate instead of a per-row
    comparison). Pass an explicit ``schema`` in production: inference
    reads the data TWICE (one full pass just to type the columns)."""
    from grove_spark.operators.dedup import watermark_literal

    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(path)
    if watermark is not None:
        df = df.where(F.col(pointer_col) > watermark_literal(df, pointer_col, watermark))
    return df


def ndjson_scan(
    spark: SparkSession,
    path: str,
    pointer_col: Optional[str] = None,
    watermark: Optional[str] = None,
    schema=None,
) -> DataFrame:
    """Read (possibly gzip-compressed) NDJSON — the O1 sink format read
    BACK as a source (a downstream consumer of the reference's gzip
    NDJSON S3 objects; codec picked per file extension by Spark). Pass an
    explicit schema in production: schema inference reads the data twice
    and gzip files are not splittable, so inference serializes on the
    largest file."""
    from grove_spark.operators.dedup import watermark_literal

    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    if pointer_col and watermark is not None:
        df = df.where(F.col(pointer_col) > watermark_literal(df, pointer_col, watermark))
    return df


def config_scan(spark: SparkSession, path: str) -> DataFrame:
    """Connector-config scan (S10 — configs/local_file.py:55-78): JSON
    documents -> a dimension DataFrame to broadcast-enrich with. Disabled
    configs are dropped exactly like base.py:61-64."""
    df = spark.read.option("multiLine", "true").json(path)
    if "disabled" in df.columns:
        df = df.where(~F.coalesce(F.col("disabled"), F.lit(False)))
    return df


def heartbeat(spark: SparkSession, n: int = 5, operation: str = "heartbeat") -> DataFrame:
    """Generator source (S8 — local/heartbeat.py:43-60): n synthetic
    entries with a timestamp; the engine's smoke source."""
    return spark.range(n).select(
        F.lit(operation).alias("type"),
        F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("timestamp"),
        F.col("id").alias("sequence"),
    )


def jdbc_pull_scan(
    spark: SparkSession,
    url: str,
    query: str,
    pointer_col: str,
    watermark: Optional[str] = None,
    num_partitions: int = 8,
    partition_col: Optional[str] = None,
    bounds: Optional[tuple] = None,
    **options,
):
    """SQL pull scan (S5 — snowflake/query_history.py:15-24): the
    parameterized `WHERE ptr > %(pointer)s` becomes a pushed dbtable
    subquery; `batch_size` flushing becomes partitioned parallel reads.
    Requires a JDBC driver on the classpath (not present in sandbox).

    The watermark is quote-escaped and the pointer column validated as a
    bare identifier before embedding — run-state values can in principle
    be attacker-influenced (stored pointer from a scraped API)."""
    if not pointer_col.replace("_", "").isalnum():
        raise ValueError(f"pointer_col must be a bare identifier: {pointer_col!r}")
    if watermark is not None:
        watermark = str(watermark).replace("'", "''")
    sub = f"(SELECT * FROM ({query}) t" + (
        f" WHERE {pointer_col} > '{watermark}') s" if watermark else ") s"
    )
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", sub)
    if partition_col and bounds:
        reader = (
            reader.option("partitionColumn", partition_col)
            .option("lowerBound", str(bounds[0]))
            .option("upperBound", str(bounds[1]))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
