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


_TOKEN_BUFS: dict = {}


def _tokens_flat(n_tok: np.ndarray, row_base: int, seed: int) -> np.ndarray:
    """Deterministic flat token values for rows [row_base, row_base+len).

    token[r][i] = (i * 2654435761 + (row_base+r) * 40503 + seed) % VOCAB —
    a multiplicative mix: cheap, reproducible, unique per row, independent
    of chunking. Buffers are reused across calls because this sandbox
    faults fresh pages at ~15 MB/s (hypervisor lazy allocation): first-
    touch cost is paid once, not per chunk.
    """
    total = int(n_tok.sum())
    cap = _TOKEN_BUFS.get("cap", 0)
    if total > cap:
        _TOKEN_BUFS.update(
            cap=total,
            i64a=np.empty(total, dtype=np.int64),
            i64b=np.empty(total, dtype=np.int64),
            i32=np.empty(total, dtype=np.int32),
        )
    a = _TOKEN_BUFS["i64a"][:total]
    b = _TOKEN_BUFS["i64b"][:total]
    out = _TOKEN_BUFS["i32"][:total]
    n_rows = len(n_tok)
    ends = np.cumsum(n_tok, dtype=np.int64)
    starts = ends - n_tok
    # a := position-in-row; b := row index (global)
    a[:] = np.arange(total, dtype=np.int64)
    b[:] = np.repeat(np.arange(n_rows, dtype=np.int64), n_tok)
    a -= starts[b]          # in-row position
    a *= 2654435761
    b += row_base
    b *= 40503
    a += b
    a += seed
    a %= VOCAB
    out[:] = a
    return out.copy()  # caller owns a compact copy


def _gen_columns(n_rows: int, seed: int, avg_tok: int):
    """Shared vectorized generation; token arrays come back FLAT
    (values + offsets) so large scales never build per-row Python lists."""
    rng = np.random.default_rng(seed)
    n_tok = np.clip(
        rng.lognormal(mean=np.log(avg_tok), sigma=0.9, size=n_rows).astype(np.int32),
        1, MAX_TOK,
    )
    src_idx = np.minimum(rng.zipf(1.3, size=n_rows) - 1, len(SOURCE_NAMES) - 1)
    sources = np.array(SOURCE_NAMES)[src_idx]
    flat_tokens = _tokens_flat(n_tok, 0, seed)
    tok_offsets = np.concatenate([[0], np.cumsum(n_tok)]).astype(np.int64)

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
    return doc_id, flat_tokens, tok_offsets, n_tok, sources, raw, event_time


def gen_sequences(n_rows: int, seed: int = SEED, avg_tok: int = 96) -> pd.DataFrame:
    """Pandas view of the fixture (token arrays as per-row numpy arrays) —
    convenient for oracle tests at SMALL n_rows; the writer below uses the
    flat Arrow path instead.

    n_tok is skewed small (lognormal clipped to [1, MAX_TOK]); source
    follows a zipf(1.3) law over SOURCE_NAMES — the head source carries
    ~30% of rows, exactly the skew the salted repartition defuses.
    """
    doc_id, flat_tokens, tok_offsets, n_tok, sources, raw, event_time = _gen_columns(
        n_rows, seed, avg_tok
    )
    tokens = np.split(flat_tokens, tok_offsets[1:-1])
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
    marker = os.path.join(out_dir, f".done-v3-{n_rows}-{seed}")
    if os.path.exists(marker):
        return paths
    import pyarrow as pa
    import pyarrow.parquet as pq

    # Random row-level draws happen ONCE, in the same order as
    # gen_sequences, so both paths produce identical values; strings and
    # token arrays are then built PER SHARD to bound fresh allocations
    # (this sandbox faults new pages at ~15 MB/s).
    rng = np.random.default_rng(seed)
    n_tok_all = np.clip(
        rng.lognormal(mean=np.log(96), sigma=0.9, size=n_rows).astype(np.int32),
        1, MAX_TOK,
    )
    src_idx = np.minimum(rng.zipf(1.3, size=n_rows) - 1, len(SOURCE_NAMES) - 1)
    sources_all = np.array(SOURCE_NAMES)[src_idx]
    level_all = LEVELS[rng.integers(0, len(LEVELS), size=n_rows)]

    shard_rows = 25_000
    n_shards = max(1, (n_rows + shard_rows - 1) // shard_rows)
    seq_dir = paths["sequences"]
    if os.path.isdir(seq_dir):
        import shutil

        shutil.rmtree(seq_dir)
    elif os.path.exists(seq_dir):
        os.remove(seq_dir)
    os.makedirs(seq_dir, exist_ok=True)
    base = np.datetime64("2024-01-01T00:00:00")
    for i in range(n_shards):
        lo, hi = i * shard_rows, min((i + 1) * shard_rows, n_rows)
        n_tok = n_tok_all[lo:hi]
        idx = np.arange(lo, hi)
        event_time = base + (idx * 997 % 86_400_000).astype("timedelta64[ms]")
        doc_id = np.char.add("doc-", np.char.zfill(idx.astype(str), 12))
        ts_str = np.datetime_as_string(event_time, unit="ms")
        raw = (
            pd.Series(ts_str) + " level=" + pd.Series(level_all[lo:hi])
            + " source=" + pd.Series(sources_all[lo:hi])
            + " doc=" + pd.Series(doc_id) + " n=" + pd.Series(n_tok.astype(str))
        )
        flat = _tokens_flat(n_tok, lo, seed)
        offs = np.concatenate([[0], np.cumsum(n_tok)]).astype(np.int32)
        table = pa.table(
            {
                "doc_id": pa.array(doc_id, type=pa.string()),
                "tokens": pa.ListArray.from_arrays(
                    pa.array(offs, type=pa.int32()), pa.array(flat, type=pa.int32())
                ),
                "n_tok": pa.array(n_tok, type=pa.int32()),
                "source": pa.array(sources_all[lo:hi], type=pa.string()),
                "raw": pa.array(raw.astype(str), type=pa.string()),
                "event_time": pa.array(event_time.astype("datetime64[us]")),
            }
        )
        pq.write_table(
            table,
            os.path.join(seq_dir, f"part-{i:05d}.parquet"),
            row_group_size=shard_rows,
        )
    pq.write_table(pa.Table.from_pandas(gen_sources_dim(), preserve_index=False), paths["sources"])
    pq.write_table(pa.Table.from_pandas(gen_sinks_dim(), preserve_index=False), paths["sinks"])
    with open(marker, "w") as f:
        f.write("ok")
    return paths
