"""Deterministic fixture generator for the BASELINE input shape.

Synthesizes (seed-fixed, numpy-vectorized, no external data):

* ``sequences(doc_id string, tokens array<int32>, n_tok int32, source
  string, raw string, event_time timestamp)`` — the pre-tokenized
  training-sequence table from BASELINE.json's input_hint. ``source`` is
  **zipfian** over ~20 SaaS-style source names so per-source skew is real
  and the salted routing repartition is load-bearing. ``raw`` is a
  synthetic log line for the grok/regex parse stage.
* ``sources`` dim — one row per source: connector, identity, operation,
  pointer_path, log_order, frequency (mirrors grove/models.py:73-124 and
  per-connector class attrs, e.g. grove/connectors/okta/system_log.py:14-17).
* ``sinks`` routing dim — (connector, descriptor, stream, sink_kind),
  mirroring ConnectorConfig.outputs defaults (grove/models.py:119-124).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

SEED = 42
VOCAB = 50257
MAX_TOK = 2048

SOURCE_NAMES = [
    "okta", "github", "slack", "onepassword", "gsuite", "stripe",
    "zoom", "zendesk", "snowflake", "bigquery", "salesforce", "zitadel",
    "tfc", "pagerduty", "atlassian", "dropbox", "fleetdm", "gandi",
    "torq", "workday",
]

LOG_ORDERS = {
    "okta": "CHRONOLOGICAL", "github": "CHRONOLOGICAL",
    "slack": "REVERSE_CHRONOLOGICAL", "gsuite": "REVERSE_CHRONOLOGICAL",
    "stripe": "REVERSE_CHRONOLOGICAL", "salesforce": "CHRONOLOGICAL",
    "zitadel": "CHRONOLOGICAL",
}

POINTER_PATHS = {
    "okta": "published", "github": "@timestamp", "slack": "date_create",
    "gsuite": "id.time", "salesforce": "TIMESTAMP_DERIVED",
    "zitadel": "sequence",
}

LEVELS = np.array(["INFO", "WARN", "ERROR", "DEBUG"])


def gen_sequences(n_rows: int, seed: int = SEED, avg_tok: int = 96) -> pd.DataFrame:
    """Vectorized generation of the sequences table.

    Token arrays are deterministic functions of (seed, row index); n_tok
    is skewed small (lognormal clipped to [1, MAX_TOK]); source follows a
    zipf(1.3) law over SOURCE_NAMES — the head source carries ~30% of
    rows, which is exactly the skew the salted repartition defuses.
    """
    rng = np.random.default_rng(seed)
    n_tok = np.clip(
        rng.lognormal(mean=np.log(avg_tok), sigma=0.9, size=n_rows).astype(np.int32),
        1, MAX_TOK,
    )
    src_idx = np.minimum(rng.zipf(1.3, size=n_rows) - 1, len(SOURCE_NAMES) - 1)
    sources = np.array(SOURCE_NAMES)[src_idx]
    # per-row deterministic tokens: a counter sequence hashed with a
    # multiplicative mix — cheap, reproducible, and unique per row
    offsets = np.concatenate([[0], np.cumsum(n_tok[:-1])]).astype(np.int64)
    total = int(n_tok.sum())
    flat_pos = np.arange(total, dtype=np.int64)
    row_of = np.repeat(np.arange(n_rows, dtype=np.int64), n_tok)
    mixed = (flat_pos - offsets[row_of]) * 2654435761 + row_of * 40503 + seed
    flat_tokens = (mixed % VOCAB).astype(np.int32)
    tokens = np.split(flat_tokens, np.cumsum(n_tok)[:-1].astype(np.int64))

    base = np.datetime64("2024-01-01T00:00:00")
    event_time = base + (np.arange(n_rows) * 997 % 86_400_000).astype("timedelta64[ms]")
    doc_id = np.char.add("doc-", np.char.zfill(np.arange(n_rows).astype(str), 12))
    level = LEVELS[rng.integers(0, len(LEVELS), size=n_rows)]
    ts_str = np.datetime_as_string(event_time, unit="ms")
    # grok-able log line: "<ts> level=<L> source=<s> doc=<id> n=<k>"
    raw = (
        pd.Series(ts_str) + " level=" + pd.Series(level)
        + " source=" + pd.Series(sources)
        + " doc=" + pd.Series(doc_id) + " n=" + pd.Series(n_tok.astype(str))
    )
    return pd.DataFrame(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": n_tok,
            "source": sources,
            "raw": raw.astype(str),
            "event_time": pd.Series(event_time),
        }
    )


def gen_sources_dim() -> pd.DataFrame:
    rows = []
    for s in SOURCE_NAMES:
        rows.append(
            {
                "source": s,
                "connector": f"{s}_audit_events",
                "identity": f"{s}.example.org",
                "operation": "all",
                "pointer_path": POINTER_PATHS.get(s, "event_time"),
                "log_order": LOG_ORDERS.get(s, "CHRONOLOGICAL"),
                "frequency": np.int32(600),
            }
        )
    return pd.DataFrame(rows)


def gen_sinks_dim() -> pd.DataFrame:
    """Default outputs: every connector routes raw->'logs' and
    processed->'processed' (grove/models.py:119-124); a third 'archive'
    sink on a subset exercises uneven fan-out."""
    rows = []
    for i, s in enumerate(SOURCE_NAMES):
        conn = f"{s}_audit_events"
        rows.append({"connector": conn, "descriptor": "logs", "stream": "raw", "sink_kind": "s3"})
        rows.append({"connector": conn, "descriptor": "processed", "stream": "processed", "sink_kind": "s3"})
        if i % 3 == 0:
            rows.append({"connector": conn, "descriptor": "archive", "stream": "raw", "sink_kind": "local"})
    return pd.DataFrame(rows)


def write_fixture(out_dir: str, n_rows: int, seed: int = SEED) -> dict:
    """Write the three parquet tables; returns paths. Idempotent."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {
        "sequences": os.path.join(out_dir, "sequences.parquet"),
        "sources": os.path.join(out_dir, "sources.parquet"),
        "sinks": os.path.join(out_dir, "sinks.parquet"),
    }
    marker = os.path.join(out_dir, f".done-{n_rows}-{seed}")
    if os.path.exists(marker):
        return paths
    import pyarrow as pa
    import pyarrow.parquet as pq

    seq = gen_sequences(n_rows, seed)
    schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("tokens", pa.list_(pa.int32())),
            ("n_tok", pa.int32()),
            ("source", pa.string()),
            ("raw", pa.string()),
            ("event_time", pa.timestamp("us")),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(seq, schema=schema, preserve_index=False),
        paths["sequences"],
        row_group_size=64_000,
    )
    pq.write_table(pa.Table.from_pandas(gen_sources_dim(), preserve_index=False), paths["sources"])
    pq.write_table(pa.Table.from_pandas(gen_sinks_dim(), preserve_index=False), paths["sinks"])
    with open(marker, "w") as f:
        f.write("ok")
    return paths
