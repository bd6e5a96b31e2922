"""A Spark 4 Python DataSource implementing the reference's core
abstraction: a paginated-cursor API connector.

The reference's connectors walk a paginated HTTP API page by page on one
thread, stopping at the stored pointer (grove/connectors/__init__.py
collect loop). Expressed Spark-natively, the SAME model becomes a
``DataSource``:

* ``partitions()`` plans page RANGES — executors fetch pages in
  parallel instead of a driver-side loop;
* ``pushFilters`` accepts the watermark predicate
  (``pointer > <stored>``) and turns it into (a) whole-page pruning via
  the page index and (b) an ``after=`` request parameter — the engine's
  typed-watermark discipline pushed INTO the connector, so already-seen
  pages are never fetched;
* the streaming side (``simpleStreamReader``) maps the run-state pointer
  onto Structured Streaming OFFSETS: the page cursor is checkpointed by
  Spark itself, giving exactly-once micro-batch ingest of the same API.

Two transports keep it testable in the sandbox and honest at scale:
``dir`` reads JSON page files (``page-00000.json`` + ``_index.json``
with per-page max pointers), ``http`` GETs ``{url}?page=N&after=W``
from any endpoint (exercised against a local http.server in tests —
the request path is the real one).

Register once per session:
    spark.dataSource.register(PagedApiDataSource)
    spark.read.format("grove_paged_api").option(...).load()
"""

from __future__ import annotations

import json
import os
from typing import Iterator, List, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    Filter,
    GreaterThan,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

DEFAULT_PAGES_PER_TASK = 8


def _open_text(p: str, mode: str = "r"):
    """Extension-keyed codec: one place decides gzip vs plain for BOTH
    the read and write sides of the page spool."""
    if p.endswith(".gz"):
        import gzip

        return gzip.open(p, mode + "t")
    return open(p, mode)


def _read_json_file(p: str):
    """Page files may be gzip-compressed (the reference spools gzip
    NDJSON; the page spool supports the same, keyed by extension)."""
    with _open_text(p) as f:
        return json.load(f)


class _PageRange(InputPartition):
    def __init__(self, pages: List[Tuple[int, str | None]]):
        # (page_number, file_name_or_None) — dir-transport entries carry
        # their file name from the index (generation-prefixed after an
        # overwrite); http entries carry None and fetch by number
        self.pages = pages


def _load_page(options, page: int, watermark, file: str | None = None) -> list:
    transport = options.get("transport", "dir")
    if transport == "dir":
        p = os.path.join(options["path"], file or f"page-{page:05d}.json")
        return _read_json_file(p)
    if transport == "http":
        from urllib.parse import urlencode

        q = {"page": page}
        if watermark is not None:
            q["after"] = watermark
        return _http_get_json(
            f"{options['url']}?{urlencode(q)}",
            int(options.get("retries", 3)),
            float(options.get("backoff_s", 0.2)),
            float(options.get("max_rps", 0.0)),
        )
    raise ValueError(f"unknown transport {transport!r}")


def _page_count(options) -> int:
    if options.get("transport", "dir") == "dir":
        idx = os.path.join(options["path"], "_index.json")
        with open(idx) as f:
            return len(json.load(f))
    return int(options["pages"])  # http: page count is a required option


def _page_index(options):
    """dir transport: [{"page": n, "max_pointer": v}, ...] — lets the
    planner PRUNE whole pages at or below the watermark (log-order
    ascending pages, the reference's chronological walk)."""
    if options.get("transport", "dir") != "dir":
        return None
    idx = os.path.join(options["path"], "_index.json")
    with open(idx) as f:
        return json.load(f)


class _PagedApiReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.options = options
        self.pointer_col = options.get("pointer_col")
        self.watermark = None

    def pushFilters(self, filters: List[Filter]):
        for f in filters:
            if (
                isinstance(f, GreaterThan)
                and self.pointer_col is not None
                and f.attribute == (self.pointer_col,)
            ):
                # fully handled: pages pruned in partitions(), residual
                # rows filtered in read(), after= param on http
                self.watermark = f.value
            else:
                yield f

    def partitions(self):
        idx = _page_index(self.options)
        if idx is None:  # http: synthesize entries by page number
            entries = [(i, None) for i in range(_page_count(self.options))]
        else:
            entries = [(e["page"], e.get("file")) for e in idx]
            if self.watermark is not None:
                keep = {
                    e["page"] for e in idx
                    if e.get("max_pointer") is None
                    or e["max_pointer"] > self.watermark
                }
                entries = [p for p in entries if p[0] in keep]
        per = int(self.options.get("pages_per_task", DEFAULT_PAGES_PER_TASK))
        ranges = [entries[i:i + per] for i in range(0, len(entries), per)]
        return [_PageRange(r) for r in ranges] or [_PageRange([])]

    def read(self, partition: _PageRange):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self.schema)
        for page, file in partition.pages:
            recs = _load_page(self.options, page, self.watermark, file)
            if self.watermark is not None:
                # the pushed filter was FULLY consumed, so SQL semantics
                # are ours to honor: a missing or null pointer never
                # satisfies `pointer > watermark` — drop, don't leak/crash
                recs = [
                    r for r in recs
                    if r.get(self.pointer_col) is not None
                    and r[self.pointer_col] > self.watermark
                ]
            if recs:
                # one Arrow batch per page: the connector is a legitimate
                # Python boundary, but it still moves COLUMNS, not
                # per-row tuples (CLAUDE.md Arrow-batched discipline)
                yield pa.RecordBatch.from_pylist(recs, schema=arrow_schema)


class _PagedApiStreamReader(SimpleDataSourceStreamReader):
    """Run-state pointer as a Structured Streaming OFFSET: each
    micro-batch drains the pages that exist beyond the checkpointed page
    cursor; Spark's checkpoint IS the commit (T1 parity without a
    manifest)."""

    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.options = options

    def initialOffset(self) -> dict:
        return {"page": int(self.options.get("start_page", 0))}

    def read(self, start: dict):
        end = {"page": _page_count(self.options)}
        # iter() over a materialized list: the harness consumes the
        # iterator eagerly and caches the RECORDS (a bare generator fails
        # pickling inside planPartitions, a bare list fails the iterator
        # type check in latestOffset)
        return (iter(self._between(start["page"], end["page"])), end)

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._between(start["page"], end["page"])

    def _between(self, lo: int, hi: int) -> List[Tuple]:
        names = [f.name for f in self.schema.fields]
        idx = _page_index(self.options)
        files = {e["page"]: e.get("file") for e in idx} if idx else {}
        return [
            tuple(rec.get(n) for n in names)
            for page in range(lo, hi)
            for rec in _load_page(self.options, page, None, files.get(page))
        ]


class PagedApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "grove_paged_api"

    def schema(self):
        ddl = self.options.get("schema")
        if not ddl:
            raise ValueError(
                "grove_paged_api needs a .option('schema', '<DDL>') — API "
                "pages are schemaless JSON and inference would read every "
                "page twice"
            )
        # returned as a DDL string: schema() runs in a session-less
        # worker python process where the DDL parser is unavailable
        return ddl

    def reader(self, schema: StructType) -> DataSourceReader:
        if self.options.get("pagination", "pages") == "cursor":
            raise ValueError(
                "cursor pagination is streaming-only: an opaque server-"
                "issued token chain cannot be planned into parallel "
                "partitions — use spark.readStream (offsets follow the "
                "chain) or a numbered-pages endpoint for batch reads"
            )
        return _PagedApiReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType):
        if self.options.get("pagination", "pages") == "cursor":
            return _CursorApiStreamReader(schema, self.options)
        return _PagedApiStreamReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool):
        return _PagedApiWriter(schema, self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return _PagedApiStreamWriter(schema, self.options, overwrite)


class _PagedApiStreamWriter(DataSourceStreamWriter):
    """Streaming page-spool sink: every micro-batch appends one
    generation through the same atomic commit as the batch writer, with
    the epoch id recorded inside the index — a replayed epoch (failure
    between sink commit and checkpoint advance) is detected there and
    dropped, so the spool is exactly-once end to end when fed from the
    paged/cursor stream readers.

    Epoch ids are SCOPED by a nonce that lives in the query's checkpoint
    directory: batch numbers restart at 0 when a checkpoint is cleared
    (and collide across independent queries), so a bare batchId would
    silently drop a fresh query's first epochs as "replays". The nonce
    resets exactly when the thing that defines replay identity — the
    checkpoint — resets. Append output mode only (a complete-mode
    snapshot-per-epoch spool would need overwrite plumbing; rejected
    loudly)."""

    def __init__(self, schema: StructType, options, overwrite: bool = False):
        if overwrite:
            raise ValueError(
                "grove_paged_api streaming sink supports append output "
                "mode only (complete mode would re-spool the full result "
                "every epoch)"
            )
        self._w = _PagedApiWriter(schema, options, overwrite=False)
        self._scope = self._scope_nonce(options)

    @staticmethod
    def _scope_nonce(options) -> str:
        ckpt = options.get("checkpointlocation") or options.get(
            "checkpointLocation", ""
        )
        if not ckpt:
            return ""
        import uuid

        marker = os.path.join(ckpt, "_grove_spool_scope")
        try:
            with open(marker) as f:
                return f.read().strip()
        except FileNotFoundError:
            os.makedirs(ckpt, exist_ok=True)
            nonce = uuid.uuid4().hex[:12]
            tmp = marker + ".tmp"
            with open(tmp, "w") as f:
                f.write(nonce)
            os.replace(tmp, marker)
            return nonce

    def write(self, iterator):
        return self._w.write(iterator)

    def commit(self, messages, batchId) -> None:
        self._w.commit(messages, batch_id=f"{self._scope}:{int(batchId)}")

    def abort(self, messages, batchId) -> None:
        self._w.abort(messages)


def write_pages(
    records: list,
    path: str,
    page_size: int,
    pointer_col: str | None = None,
) -> int:
    """Materialize records as the dir-transport page layout (test/dev
    harness and the on-disk spool format a collector daemon would write):
    ``page-NNNNN.json`` files plus ``_index.json`` with per-page max
    pointers for page pruning. Returns the page count."""
    os.makedirs(path, exist_ok=True)
    index = []
    for i in range(0, max(len(records), 1), page_size):
        page = records[i:i + page_size]
        n = i // page_size
        with open(os.path.join(path, f"page-{n:05d}.json"), "w") as f:
            json.dump(page, f, default=str)
        index.append({
            "page": n,
            "file": f"page-{n:05d}.json",
            "max_pointer": max(
                (r[pointer_col] for r in page
                 if r.get(pointer_col) is not None),
                default=None,
            ) if pointer_col else None,
        })
    with open(os.path.join(path, "_index.json"), "w") as f:
        json.dump(index, f)
    return len(index)


class _PageCommit(WriterCommitMessage):
    def __init__(self, files):
        # [(tmp_name, n_records, max_pointer), ...] in task order
        self.files = files


class _PagedApiWriter(DataSourceWriter):
    """Distributed page-spool writer with a Hadoop-style commit
    protocol: each task writes temp page files and reports them in its
    commit message; the driver's commit() assigns the global ascending
    page numbering, renames everything into place and writes
    _index.json LAST — a reader never sees a half-written spool, and an
    aborted write leaves only temp files that abort() removes."""

    def __init__(self, schema: StructType, options, overwrite: bool):
        self.schema = schema
        self.options = options
        self.overwrite = overwrite
        self.path = options["path"]
        self.pointer_col = options.get("pointer_col")
        self.page_size = int(options.get("page_size", 500))

    def write(self, iterator) -> _PageCommit:
        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        names = [f.name for f in self.schema.fields]
        files, buf, seq = [], [], 0

        compress = self.options.get("compression", "") == "gzip"

        def flush():
            nonlocal seq
            if not buf:
                return
            ext = ".json.gz" if compress else ".json"
            tmp = f"_tmp-{pid:05d}-{seq:05d}{ext}"
            full = os.path.join(self.path, tmp)
            with _open_text(full, "w") as f:
                json.dump(buf, f, default=str)
            vals = (
                [r[self.pointer_col] for r in buf
                 if r.get(self.pointer_col) is not None]
                if self.pointer_col else []
            )
            mp = max(vals) if vals else None
            files.append((tmp, len(buf), mp))
            seq += 1
            buf.clear()

        for row in iterator:
            buf.append(dict(zip(names, tuple(row))))
            if len(buf) >= self.page_size:
                flush()
        flush()
        return _PageCommit(files)

    def commit(self, messages, batch_id=None) -> None:
        # generation-atomic: new pages land under a fresh generation
        # prefix (no collision with live files), the index is REPLACED
        # atomically, and only then are unreferenced page files removed.
        # A crash at any point leaves a consistent spool — before the
        # replace readers see the old generation intact, after it the
        # new one; orphans are swept by the next commit.
        idx_path = os.path.join(self.path, "_index.json")
        old_index, gen = [], 0
        if os.path.exists(idx_path):
            with open(idx_path) as f:
                old_index = json.load(f)
            gens = [
                int(e["file"].split("-")[1][1:]) for e in old_index
                if e.get("file", "").startswith("page-g")
            ]
            gen = max(gens, default=-1) + 1
        if batch_id is not None and any(
            e.get("batch") == batch_id for e in old_index
        ):
            # streaming replay of an already-committed epoch: drop the
            # temp files, keep the spool as-is (exactly-once via the
            # batch id recorded INSIDE the atomically-replaced index)
            self.abort(messages)
            return
        index, n = ([] if self.overwrite else list(old_index)),             (0 if self.overwrite else len(old_index))
        for msg in messages:
            for tmp, count, mp in msg.files:
                ext = ".json.gz" if tmp.endswith(".gz") else ".json"
                final = f"page-g{gen:03d}-{n:05d}{ext}"
                os.replace(
                    os.path.join(self.path, tmp), os.path.join(self.path, final)
                )
                entry = {"page": n, "file": final, "max_pointer": mp, "n": count}
                if batch_id is not None:
                    entry["batch"] = batch_id
                index.append(entry)
                n += 1
        tmp_idx = idx_path + ".tmp"
        with open(tmp_idx, "w") as f:
            json.dump(index, f)
        os.replace(tmp_idx, idx_path)
        # commit runs after every task of THIS (single) writer finished:
        # any _tmp-* still on disk belongs to a task that died without a
        # commit message — sweep it (the spool is single-writer by
        # contract; concurrent writers to one path are undefined)
        committed = {t for m in messages if m is not None for t, _, _ in m.files}
        for f in os.listdir(self.path):
            if f.startswith("_tmp-") and f not in committed:
                try:
                    os.unlink(os.path.join(self.path, f))
                except FileNotFoundError:
                    pass
        # sweep only files referenced by NEITHER the new nor the old
        # index: a reader that planned against the old index keeps its
        # files until the NEXT commit (the docstring's contract) — the
        # prior generation is unreferenced-but-present for one commit
        live = {e.get("file") for e in index if e.get("file")}
        live |= {e.get("file") or f"page-{e['page']:05d}.json" for e in old_index}
        for f in os.listdir(self.path):
            if (
                f.startswith("page-")
                and f not in live
                and not f.endswith(".json.tmp")
            ):
                try:
                    os.unlink(os.path.join(self.path, f))
                except FileNotFoundError:
                    pass

    def abort(self, messages) -> None:
        # a FAILED task's commit message is None (the DataSource
        # contract) — abort is called precisely then, so skip them
        for msg in messages:
            if msg is None:
                continue
            for tmp, _, _ in msg.files:
                try:
                    os.unlink(os.path.join(self.path, tmp))
                except FileNotFoundError:
                    pass


_last_request_ts: dict = {}  # per-process pacing state (executor-local)


def _pace(max_rps: float, key: str = "") -> None:
    """Per-task rate limiting (the reference's API clients throttle to
    the provider's limit; grove/connectors issue one request at a time —
    here each executor task paces ITSELF, so the cluster-wide rate is
    max_rps * parallelism: size pages_per_task/partitions accordingly,
    documented on the reader options)."""
    import time

    if max_rps <= 0:
        return
    now = time.monotonic()
    wait = _last_request_ts.get(key, 0.0) + 1.0 / max_rps - now
    if wait > 0:
        time.sleep(wait)
        now = time.monotonic()
    _last_request_ts[key] = now


def _http_get_json(url: str, retries: int, backoff_s: float,
                   max_rps: float = 0.0):
    from urllib.parse import urlsplit

    pace_key = urlsplit(url).netloc  # per-endpoint budget, not global
    """Bounded-retry GET with deterministic exponential backoff — the
    reference's API clients retry transient 5xx/connection errors; the
    executor-side fetch does the same (no jitter: reruns behave
    identically)."""
    import http.client
    import time
    from urllib.error import HTTPError, URLError
    from urllib.request import urlopen

    last = None
    for attempt in range(retries + 1):
        try:
            _pace(max_rps, pace_key)
            with urlopen(url, timeout=30) as r:
                return json.loads(r.read())
        # ConnectionError / HTTPException cover READ-phase failures
        # (reset mid-body, IncompleteRead) that urlopen does not wrap
        # in URLError — those are transient too
        except (HTTPError, URLError, TimeoutError, ConnectionError,
                http.client.HTTPException) as e:  # noqa: PERF203
            if isinstance(e, HTTPError) and e.code < 500 and e.code != 429:
                raise  # 4xx (except throttling) is a config error, not transient
            last = e
            if attempt < retries:
                time.sleep(backoff_s * (2 ** attempt))
    raise last


def _load_chunk(options, cursor: str) -> dict:
    """Opaque-cursor transports: one chunk = {"records": [...],
    "next": <token|null>}."""
    transport = options.get("transport", "dir")
    if transport == "dir":
        p = os.path.join(options["path"], f"chunk-{cursor}.json")
        if not os.path.exists(p) and os.path.exists(p + ".gz"):
            p += ".gz"
        return _read_json_file(p)
    if transport == "http":
        from urllib.parse import urlencode

        url = f"{options['url']}?{urlencode({'cursor': cursor})}"
        return _http_get_json(
            url,
            int(options.get("retries", 3)),
            float(options.get("backoff_s", 0.2)),
            float(options.get("max_rps", 0.0)),
        )
    raise ValueError(f"unknown transport {transport!r}")


class _CursorApiStreamReader(SimpleDataSourceStreamReader):
    """Opaque-cursor pagination (the reference's S4 connectors: the next
    token is server-issued and unparseable) CANNOT be planned into
    parallel page ranges — which is exactly why the reference walks it
    on one thread. Spark-natively it maps onto streaming OFFSETS: the
    offset IS the cursor token, each micro-batch follows the chain up to
    ``max_pages_per_batch`` links, and Spark's checkpoint commits the
    cursor exactly like run-state commits a pointer. Replay between two
    committed cursors re-walks the chain (cursor APIs replay
    deterministically from a token — the same property grove's resume
    depends on)."""

    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.options = options

    def initialOffset(self) -> dict:
        return {"cursor": self.options.get("start_cursor", "head"), "pos": 0}

    def read(self, start: dict):
        per_batch = int(self.options.get("max_pages_per_batch", 64))
        names = [f.name for f in self.schema.fields]
        out: List[Tuple] = []
        cur, pos = start["cursor"], start.get("pos", 0)
        for _ in range(per_batch):
            chunk = _load_chunk(self.options, cur)
            recs = chunk.get("records", [])
            out.extend(tuple(r.get(n) for n in names) for r in recs[pos:])
            nxt = chunk.get("next")
            if nxt is None:
                # live tail: park AFTER the consumed records — the next
                # tick re-polls this chunk for appended records or a new
                # next link, emitting only what it has not yet delivered
                pos = len(recs)
                break
            cur, pos = nxt, 0
        end = {"cursor": cur, "pos": pos}
        if end == start:
            return (iter([]), start)  # nothing new: empty batch, no dupes
        return (iter(out), end)

    def readBetweenOffsets(self, start: dict, end: dict):
        names = [f.name for f in self.schema.fields]
        out: List[Tuple] = []
        cur, pos = start["cursor"], start.get("pos", 0)
        seen: set = set()
        while cur is not None:
            if cur in seen:
                raise ValueError(
                    f"cursor chain cycles at {cur!r} during replay — the "
                    "server reissued tokens; the committed batch cannot be "
                    "reproduced"
                )
            seen.add(cur)
            chunk = _load_chunk(self.options, cur)
            recs = chunk.get("records", [])
            if cur == end["cursor"]:
                return out + [
                    tuple(r.get(n) for n in names)
                    for r in recs[pos:end.get("pos", len(recs))]
                ]
            out.extend(tuple(r.get(n) for n in names) for r in recs[pos:])
            cur, pos = chunk.get("next"), 0
        raise ValueError(
            f"replay never reached committed cursor {end['cursor']!r} from "
            f"{start['cursor']!r} — the chain was compacted/rewritten; "
            "exactly-once replay is impossible (clear the checkpoint to "
            "restart from a live cursor)"
        )
