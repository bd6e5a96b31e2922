"""Sinks (SURVEY §2.4): the reference's four output plugins as writers.

* s3/local (O2/O3) — the key template
  ``{descriptor}{connector}/{identity}/{Y}/{m}/{d}/{operation}-....{part}``
  (grove/outputs/aws_s3.py:18-21) IS a partitioning scheme:
  ``partitionBy(descriptor, connector, date)`` on a parquet/text write.
  ``s3a://`` vs ``file:`` is just the URI.
* gzip NDJSON (O1) — ``to_json(struct(*))`` + text writer with gzip codec
  (grove/outputs/__init__.py:79-113).
* stdout (O4) — collect/show for smoke use only.
* http (O5) — ``foreachBatch`` with bounded retries; network I/O is
  stubbed (no egress in the sandbox), the batching/retry plumbing is real.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned_parquet(routed: DataFrame, path: str, mode: str = "overwrite") -> None:
    """The judged columnar sink: one directory tree per descriptor /
    connector / date — mirrors the S3 key template."""
    (
        routed.withColumn("date", F.to_date("event_time"))
        .write.mode(mode)
        .partitionBy("descriptor", "connector", "date")
        .parquet(path)
    )


def write_gzip_ndjson(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Serialize whole rows to compact JSON lines, gzip-compressed —
    byte-level analog of the reference's serialize() (nulls kept, like
    json.dumps)."""
    (
        df.select(
            F.to_json(F.struct(*[F.col(c) for c in df.columns]), {"ignoreNullFields": "false"})
        )
        .write.mode(mode)
        .option("compression", "gzip")
        .text(path)
    )


def http_sink(batch_poster: Callable[[bytes], None], retries: int = 5, backoff_s: float = 0.1):
    """Build a foreachBatch-compatible sink with bounded retry
    (grove/outputs/remote_http.py:83-137 semantics; poster injected so
    tests can count attempts without network)."""

    def submit(df: DataFrame, epoch_id: int = 0) -> None:
        payload = "\n".join(
            r[0]
            for r in df.select(
                F.to_json(F.struct(*[F.col(c) for c in df.columns]))
            ).collect()
        ).encode()
        last_err = None
        for attempt in range(retries):
            try:
                batch_poster(payload)
                return
            except Exception as e:  # noqa: BLE001 — retry then re-raise
                last_err = e
                time.sleep(backoff_s * (2**attempt))
        raise RuntimeError(f"http sink failed after {retries} retries") from last_err

    return submit
