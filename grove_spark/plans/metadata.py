"""The ``_grove`` metadata envelope.

Every output row in the reference is wrapped with collection metadata
(metadata() grove/connectors/__init__.py:550-571, merged at
grove/outputs/__init__.py:100-104: connector, identity, operation,
pointer, previous_pointer, collection_time, runtime-context, version).
Here it's one struct column built from the enriched dims + run literals —
a zero-shuffle projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ENGINE_VERSION = "grove_spark-0.1.0"


def grove_metadata(
    df: DataFrame,
    connector: str | Column = "connector",
    identity: str | Column = "identity",
    operation: str | Column = "operation",
    pointer: Column | None = None,
    previous_pointer: str | None = None,
    collection_time: str | None = None,
) -> DataFrame:
    """Attach the ``_grove`` struct column (field set mirrors the
    reference's metadata(); collection_time is a run-level literal passed
    by the driver so the plan stays deterministic)."""

    def c(x):
        return F.col(x) if isinstance(x, str) else x

    fields = [
        c(connector).alias("connector"),
        c(identity).alias("identity"),
        c(operation).alias("operation"),
        (pointer if pointer is not None else F.lit(None).cast("string")).alias("pointer"),
        F.lit(previous_pointer).cast("string").alias("previous_pointer"),
        F.lit(collection_time).cast("string").alias("collection_time"),
        F.lit(ENGINE_VERSION).alias("version"),
    ]
    return df.withColumn("_grove", F.struct(*fields))
