"""Broadcast enrichment joins (SURVEY §2.5).

The reference's three join-like behaviors (config/secret hydration,
metadata envelope, ticket->comments N+1 fetch) all become one primitive:
``df.join(broadcast(dim), key, "left")``. Dims are tiny (tens of rows per
connector fleet) — at 100 TB the fact side never shuffles for these.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(
    df: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
    prefix: str | None = None,
) -> DataFrame:
    """Left-broadcast-join ``dim`` onto ``df``; optionally prefix the dim's
    payload columns to avoid collisions."""
    keys = [on] if isinstance(on, str) else list(on)
    if prefix:
        renames = {c: f"{prefix}{c}" for c in dim.columns if c not in keys}
        for old, new in renames.items():
            dim = dim.withColumnRenamed(old, new)
    return df.join(F.broadcast(dim), keys, how)
