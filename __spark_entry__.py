"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship parse->enrich->route->aggregate pipeline at sf0.001.
``queries`` — one entry per implemented operator (SURVEY.md §2), built
              from grove_spark's real operators.
``oracle_sql`` — DuckDB twins of every query (same column names/types).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the multi-output routing
    fan-out with per-sink aggregate counts (the judged telemetry)."""
    from grove_spark.queries import q_route_counts

    return q_route_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from grove_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from grove_spark.queries import ORACLE

    return dict(ORACLE)
