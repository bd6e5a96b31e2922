"""The paginated-cursor API connector as a Spark 4 Python DataSource:
partitioned page planning, watermark pushdown (page pruning + after=
request param), HTTP transport against a real local server, and the
streaming reader whose offsets ARE the page cursor."""

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from grove_spark.sources.api_source import (
    PagedApiDataSource,
    _PagedApiReader,
    write_pages,
)


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("api_pages"))
    recs = [{"event_id": i, "et": f"e{i % 3}"} for i in range(1000)]
    write_pages(recs, d, page_size=100, pointer_col="event_id")
    return d


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(PagedApiDataSource)
    return spark


def test_dir_transport_read_and_watermark(registered, pages_dir):
    spark = registered
    df = (
        spark.read.format("grove_paged_api")
        .option("path", pages_dir)
        .option("schema", "event_id bigint, et string")
        .option("pointer_col", "event_id")
        .load()
    )
    assert df.count() == 1000
    wm = df.where(F.col("event_id") > 499)
    assert wm.count() == 500
    assert wm.agg(F.min("event_id")).first()[0] == 500


def test_watermark_prunes_whole_pages(pages_dir):
    """Planner-level: the pushed GreaterThan drops pages whose
    max_pointer <= watermark BEFORE any fetch (grove's walk-until-
    pointer, inverted into pruning)."""
    from pyspark.sql.datasource import GreaterThan
    from pyspark.sql.types import StructType

    opts = {"path": pages_dir, "pointer_col": "event_id", "pages_per_task": "2"}
    schema = StructType.fromDDL("event_id bigint, et string")
    r = _PagedApiReader(schema, opts)
    assert sum(len(p.pages) for p in r.partitions()) == 10
    r2 = _PagedApiReader(schema, opts)
    residual = list(r2.pushFilters([GreaterThan(("event_id",), 499)]))
    assert residual == []  # fully consumed
    kept = [pg for p in r2.partitions() for pg, _file in p.pages]
    assert kept == [5, 6, 7, 8, 9]
    # boundary page is row-filtered in read(); pages arrive as Arrow
    # batches (columns, not per-row tuples)
    batches = [b for p in r2.partitions() for b in r2.read(p)]
    rows = [t for b in batches for t in b.to_pylist()]
    assert len(rows) == 500 and min(t["event_id"] for t in rows) == 500


def test_http_transport_against_local_server(registered, pages_dir):
    """The real request path: GET ?page=N&after=W against a live local
    http.server; the server applies after= exactly like a cursor API."""
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            page = int(q["page"][0])
            after = int(q["after"][0]) if "after" in q else None
            p = os.path.join(pages_dir, f"page-{page:05d}.json")
            recs = json.load(open(p)) if os.path.exists(p) else []
            if after is not None:
                recs = [r for r in recs if r["event_id"] > after]
            body = json.dumps(recs).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/events"
        df = (
            registered.read.format("grove_paged_api")
            .option("transport", "http")
            .option("url", url)
            .option("pages", "10")
            .option("schema", "event_id bigint, et string")
            .option("pointer_col", "event_id")
            .load()
        )
        wm = df.where(F.col("event_id") > 899)
        assert wm.count() == 100
        assert wm.agg(F.min("event_id")).first()[0] == 900
    finally:
        srv.shutdown()


def test_stream_reader_pages_as_offsets(registered, pages_dir, tmp_path):
    """Streaming ingest of the same API: the page cursor is a Spark
    offset, checkpointed by the engine — T1's pointer commit expressed
    as Structured Streaming semantics."""
    spark = registered
    out = str(tmp_path / "out")

    def run():
        q = (
            spark.readStream.format("grove_paged_api")
            .option("path", pages_dir)
            .option("schema", "event_id bigint, et string")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append").trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination()

    run()
    assert spark.read.parquet(out).count() == 1000
    # offsets committed: a restart from the same checkpoint re-reads
    # NOTHING (the page cursor moved past every page) — zero duplicates
    run()
    assert spark.read.parquet(out).count() == 1000


def test_missing_schema_is_loud(registered):
    with pytest.raises(Exception, match="schema"):
        registered.read.format("grove_paged_api").option("path", "/tmp/x").load()


def test_writer_roundtrip_with_commit_protocol(registered, tmp_path):
    """Distributed page-spool write: tasks spill temp pages, the driver
    commit assigns global page numbers and writes _index.json LAST; the
    reader (incl. page pruning) consumes the result directly."""
    spark = registered
    out = str(tmp_path / "spool")
    df = spark.range(1000).selectExpr(
        "id AS event_id", "concat('e', id % 3) AS et"
    ).repartition(4)
    (
        df.write.format("grove_paged_api")
        .option("path", out)
        .option("pointer_col", "event_id")
        .option("page_size", "100")
        .mode("append")
        .save()
    )
    idx = json.load(open(os.path.join(out, "_index.json")))
    assert sum(e["n"] for e in idx) == 1000
    assert not [f for f in os.listdir(out) if f.startswith("_tmp-")]
    back = (
        spark.read.format("grove_paged_api")
        .option("path", out)
        .option("schema", "event_id bigint, et string")
        .option("pointer_col", "event_id")
        .load()
    )
    assert back.count() == 1000
    assert back.select("event_id").distinct().count() == 1000
    # pruning works on writer-produced indexes too (unordered pages:
    # only pages whose max_pointer clears the watermark are fetched)
    assert back.where(F.col("event_id") > 899).count() == 100

    # overwrite replaces the spool atomically at commit
    spark.range(10).selectExpr("id AS event_id", "'x' AS et") \
        .coalesce(1).write.format("grove_paged_api") \
        .option("path", out).option("pointer_col", "event_id") \
        .mode("overwrite").save()
    idx2 = json.load(open(os.path.join(out, "_index.json")))
    assert sum(e["n"] for e in idx2) == 10


def test_fleet_runs_over_the_api_connector(registered, tmp_path):
    """End-to-end: the config-driven fleet (assemble_fleet) ingesting
    from the paged-API DataSource instead of parquet — the member's
    typed watermark predicate travels through Catalyst INTO
    pushFilters, so already-ingested pages are pruned at the source."""
    from grove_spark.config import ConnectorConfig, assemble_fleet

    spark = registered
    d = str(tmp_path / "seq_pages")
    recs = [
        {"doc_id": f"d{i}", "tokens": [i % 7, i % 5], "n_tok": 2,
         "source": "okta", "event_time": i}
        for i in range(400)
    ]
    write_pages(recs, d, page_size=50, pointer_col="event_time")
    seq = (
        spark.read.format("grove_paged_api")
        .option("path", d)
        .option(
            "schema",
            "doc_id string, tokens array<int>, n_tok int, "
            "source string, event_time bigint",
        )
        .option("pointer_col", "event_time")
        .load()
    )
    cfgs = [ConnectorConfig.from_dict(
        {"connector": "okta_system_log", "identity": "corp", "source": "okta"}
    )]
    routed = assemble_fleet(
        spark, cfgs, seq,
        watermarks={cfgs[0].reference(): "199"},
        pointer_col="event_time",
    )
    rows = routed.collect()
    # 200 events above the watermark, each routed to raw + processed
    ids = {r["doc_id"] for r in rows}
    assert len(ids) == 200 and "d199" not in ids and "d200" in ids


def test_writer_generations_and_append(registered, tmp_path):
    """Overwrite is generation-atomic: new pages land under a fresh
    g-prefix, the index replace is the commit point, unreferenced files
    are swept after. Append stacks generations without touching live
    pages."""
    spark = registered
    out = str(tmp_path / "spool")

    def w(n, mode):
        spark.range(n).selectExpr("id AS event_id", "'x' AS et") \
            .coalesce(1).write.format("grove_paged_api") \
            .option("path", out).option("pointer_col", "event_id") \
            .option("page_size", "50").mode(mode).save()

    w(100, "append")
    w(100, "append")  # second generation appended
    idx = json.load(open(os.path.join(out, "_index.json")))
    assert sum(e["n"] for e in idx) == 200
    gens = {e["file"].split("-")[1] for e in idx}
    assert gens == {"g000", "g001"}
    w(50, "overwrite")
    idx2 = json.load(open(os.path.join(out, "_index.json")))
    assert sum(e["n"] for e in idx2) == 50
    live = {e["file"] for e in idx2}
    on_disk = {f for f in os.listdir(out) if f.startswith("page-")}
    # the PREVIOUS generation survives one commit (concurrent readers
    # that planned against the old index keep their files)...
    assert live <= on_disk and len(on_disk) > len(live)
    w(50, "overwrite")
    idx3 = json.load(open(os.path.join(out, "_index.json")))
    live3 = {e["file"] for e in idx3} | live  # gen n-1 still shielded
    on_disk3 = {f for f in os.listdir(out) if f.startswith("page-")}
    # ...and generations older than n-1 are swept by the next commit
    assert on_disk3 == live3
    back = (
        spark.read.format("grove_paged_api")
        .option("path", out)
        .option("schema", "event_id bigint, et string")
        .load()
    )
    assert back.count() == 50


def test_cursor_pagination_stream_exactly_once(registered, tmp_path):
    """Opaque-cursor pagination (the reference's S4 connectors) as a
    streaming source: the offset is (cursor, consumed-pos), so the live
    tail chunk's records are delivered exactly once even though the
    reader parks on it and re-polls. A later tick follows the new next
    link without re-emitting anything."""
    spark = registered
    api = tmp_path / "capi"
    api.mkdir()
    out = str(tmp_path / "out")

    def chunk(name, recs, nxt):
        (api / f"chunk-{name}.json").write_text(json.dumps(
            {"records": recs, "next": nxt}))

    chunk("head", [{"event_id": i} for i in range(3)], "t1")
    chunk("t1", [{"event_id": 3}, {"event_id": 4}], None)

    def run():
        q = (
            spark.readStream.format("grove_paged_api")
            .option("path", str(api))
            .option("pagination", "cursor")
            .option("schema", "event_id bigint")
            .load()
            .writeStream.format("parquet").option("path", out)
            .outputMode("append").trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination()

    run()
    assert spark.read.parquet(out).count() == 5
    # the API grows: t1 gains appended records AND a next link
    chunk("t1", [{"event_id": 3}, {"event_id": 4}, {"event_id": 5}], "t2")
    chunk("t2", [{"event_id": 6}, {"event_id": 7}], None)
    run()
    got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert got == [0, 1, 2, 3, 4, 5, 6, 7]  # no loss, no duplicates
    run()  # idle tick: nothing new, nothing re-emitted
    assert spark.read.parquet(out).count() == 8


def test_http_retry_backoff_on_transient_errors(registered, tmp_path):
    """Transient 500s are retried with deterministic backoff; a 404 is a
    config error and fails immediately."""
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from urllib.parse import parse_qs, urlparse

    fails = {"n": 2}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if urlparse(self.path).path.endswith("/nope"):
                self.send_response(404)
                self.end_headers()
                return
            q = parse_qs(urlparse(self.path).query)
            if fails["n"] > 0:
                fails["n"] -= 1
                self.send_response(500)
                self.end_headers()
                return
            page = int(q["page"][0])
            recs = [{"event_id": page * 10 + i} for i in range(10)] if page < 2 else []
            body = json.dumps(recs).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = (
            registered.read.format("grove_paged_api")
            .option("transport", "http")
            .option("url", f"http://127.0.0.1:{srv.server_port}/e")
            .option("pages", "2")
            .option("schema", "event_id bigint")
            .option("backoff_s", "0.05")
            .load()
        )
        assert df.count() == 20  # survived the two 500s

        from grove_spark.sources.api_source import _http_get_json
        from urllib.error import HTTPError
        t0 = __import__("time").perf_counter()
        with pytest.raises(HTTPError):
            _http_get_json(
                f"http://127.0.0.1:{srv.server_port}/nope",
                retries=3, backoff_s=0.2,
            )
        # a 404 fails IMMEDIATELY (no 0.2+0.4+0.8s backoff schedule)
        assert __import__("time").perf_counter() - t0 < 0.2
    finally:
        srv.shutdown()


def test_cursor_batch_read_and_broken_replay_are_loud(registered, tmp_path):
    """Cursor pagination is streaming-only for batch reads; a replay
    whose committed cursor is unreachable (compacted chain) or whose
    chain cycles (reissued tokens) raises instead of hanging or
    silently emitting the wrong batch."""
    from grove_spark.sources.api_source import _CursorApiStreamReader
    from pyspark.sql.types import StructType

    with pytest.raises(Exception, match="streaming-only"):
        (registered.read.format("grove_paged_api")
         .option("pagination", "cursor").option("path", str(tmp_path))
         .option("schema", "event_id bigint").load().count())

    api = tmp_path / "api"
    api.mkdir()
    (api / "chunk-head.json").write_text(json.dumps(
        {"records": [{"event_id": 1}], "next": "t1"}))
    (api / "chunk-t1.json").write_text(json.dumps(
        {"records": [{"event_id": 2}], "next": "head"}))  # cycle!
    r = _CursorApiStreamReader(
        StructType.fromDDL("event_id bigint"), {"path": str(api)}
    )
    with pytest.raises(ValueError, match="cycles"):
        r.readBetweenOffsets({"cursor": "head", "pos": 0},
                             {"cursor": "gone", "pos": 0})
    (api / "chunk-t1.json").write_text(json.dumps(
        {"records": [{"event_id": 2}], "next": None}))
    with pytest.raises(ValueError, match="never reached"):
        r.readBetweenOffsets({"cursor": "head", "pos": 0},
                             {"cursor": "gone", "pos": 0})


def test_max_rps_paces_requests():
    """max_rps throttles successive fetches in one task: 4 requests at
    20 rps must take at least ~150 ms; unthrottled they are instant."""
    import time

    from grove_spark.sources import api_source

    # pace directly (no network): 4 paced calls at 20 rps
    api_source._last_request_ts.clear()
    t0 = time.monotonic()
    for _ in range(4):
        api_source._pace(20.0)
    assert time.monotonic() - t0 >= 0.149
    api_source._last_request_ts.clear()
    t0 = time.monotonic()
    for _ in range(4):
        api_source._pace(0.0)  # disabled: no sleep
    assert time.monotonic() - t0 < 0.05


def test_gzip_page_compression_roundtrip(registered, tmp_path):
    """compression=gzip writes .json.gz pages; the reader picks the
    codec from the extension in the index."""
    spark = registered
    out = str(tmp_path / "gz")
    spark.range(300).selectExpr("id AS event_id", "'x' AS et") \
        .coalesce(2).write.format("grove_paged_api") \
        .option("path", out).option("pointer_col", "event_id") \
        .option("page_size", "100").option("compression", "gzip") \
        .mode("append").save()
    assert all(f.endswith(".json.gz") for f in os.listdir(out)
               if f.startswith("page-"))
    back = (
        spark.read.format("grove_paged_api")
        .option("path", out)
        .option("schema", "event_id bigint, et string")
        .option("pointer_col", "event_id")
        .load()
    )
    assert back.count() == 300
    assert back.where(F.col("event_id") > 249).count() == 50


def test_stream_writer_end_to_end_api_to_api(registered, tmp_path):
    """The full streaming pipe: cursor-API stream IN -> transform ->
    page-spool stream OUT, with the epoch id inside the atomically-
    replaced index making replays idempotent."""
    spark = registered
    api = tmp_path / "in"
    api.mkdir()
    (api / "chunk-head.json").write_text(json.dumps(
        {"records": [{"event_id": i} for i in range(50)], "next": None}))
    out = str(tmp_path / "spool")

    def run():
        q = (
            spark.readStream.format("grove_paged_api")
            .option("path", str(api))
            .option("pagination", "cursor")
            .option("schema", "event_id bigint")
            .load()
            .selectExpr("event_id", "event_id * 2 AS doubled")
            .writeStream.format("grove_paged_api")
            .option("path", out)
            .option("pointer_col", "event_id")
            .option("page_size", "20")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    back = (
        spark.read.format("grove_paged_api")
        .option("path", out)
        .option("schema", "event_id bigint, doubled bigint")
        .load()
    )
    assert back.count() == 50
    assert back.agg(F.sum("doubled")).first()[0] == sum(2 * i for i in range(50))
    run()  # idle restart: no new input, no duplicate pages
    assert back.count() == 50
    # epoch ids are recorded in the index entries
    idx = json.load(open(os.path.join(out, "_index.json")))
    assert all("batch" in e for e in idx)


def test_stream_writer_cleared_checkpoint_is_not_a_replay(registered, tmp_path):
    """Epoch dedup is scoped by a checkpoint-resident nonce: clearing
    the checkpoint restarts batch numbering at 0, and a bare-batchId
    dedup would silently DROP the fresh query's first epoch as a
    'replay'. With the nonce, the second query's data lands."""
    import shutil

    spark = registered
    api = tmp_path / "in2"
    api.mkdir()
    (api / "chunk-head.json").write_text(json.dumps(
        {"records": [{"event_id": 1}], "next": None}))
    out, ckpt = str(tmp_path / "spool2"), str(tmp_path / "ckpt2")

    def run():
        q = (
            spark.readStream.format("grove_paged_api")
            .option("path", str(api)).option("pagination", "cursor")
            .option("schema", "event_id bigint").load()
            .writeStream.format("grove_paged_api").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    run()
    shutil.rmtree(ckpt)  # user resets the query
    run()  # batchId 0 again — must APPEND, not be dropped as a replay
    idx = json.load(open(os.path.join(out, "_index.json")))
    scopes = {e["batch"].split(":")[0] for e in idx}
    assert len(scopes) == 2  # two distinct query scopes
    assert sum(e["n"] for e in idx) == 2
