"""Canonical entry hashing — parity with the reference's ``hash_entry``.

The reference hashes each entry as md5 of compact JSON
(``json.dumps(entry, separators=(",", ":"), default=str)`` —
grove/connectors/__init__.py:590-602). Byte-exact parity in Spark requires
pinning the serialized key order, so ``entry_hash`` takes an explicit
column list: the canonical order is THE COLUMN ORDER GIVEN (document it
per table). ``to_json`` must keep nulls (json.dumps does).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonical_json(cols: Sequence[str | Column]) -> Column:
    """Compact JSON of the given columns, nulls kept, key order = arg order."""
    named = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.to_json(F.struct(*named), {"ignoreNullFields": "false"})


def entry_hash(cols: Sequence[str | Column]) -> Column:
    """md5 hex digest of the canonical JSON (reference hash_entry parity)."""
    return F.md5(canonical_json(cols))


def identity_ref(connector: Column | str, identity: Column | str, operation: Column | str) -> Column:
    """Cache/run-state key: ``<connector>.<md5(identity)>[.<operation>]`` —
    the exact scheme of ConnectorConfig.reference() (grove/models.py:126-150)
    + cache_key() (grove/connectors/__init__.py:573-588)."""
    conn = F.col(connector) if isinstance(connector, str) else connector
    ident = F.col(identity) if isinstance(identity, str) else identity
    op = F.col(operation) if isinstance(operation, str) else operation
    return F.concat_ws(".", conn, F.md5(ident), op)
