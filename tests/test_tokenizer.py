"""Trained byte-level BPE tokenizer: determinism, exact roundtrip,
sequential-merge equivalence, Spark kernel + pure-Catalyst decode."""

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from grove_spark.operators.tokenizer import (
    _PY_PIECE,
    BPETokenizer,
    detokenize_col,
    tokenize,
    tokenize_documents,
    train_bpe,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox again and again and again",
    "pack my box with five dozen liquor jugs",
    "sphinx of black quartz judge my vow",
    "the the the quick quick brown",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)],
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]),
    )


@pytest.fixture(scope="module")
def tok(corpus_df):
    return train_bpe(corpus_df, num_merges=64)


def test_training_is_deterministic(corpus_df, tok):
    assert train_bpe(corpus_df, num_merges=64).merges == tok.merges
    assert len(tok.merges) > 0
    # frequent words collapse into few ids: "the" occurs most — some
    # merged token's bytes must spell it
    assert b"the" in tok.vocab_bytes


def test_piece_regex_partitions_completely():
    for s in ["a_b c", "x2y", "héllo wörld", "a,b;c", "\t \n", "🎉a🎉",
              "__init__", "1e-5", ""]:
        assert "".join(_PY_PIECE.findall(s)) == s


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_roundtrip_any_text(s):
    """Byte-level base vocab: EVERY string roundtrips exactly, trained
    merges or not."""
    tok = BPETokenizer(merges=((116, 104), (256, 101)))  # th, the
    assert tok.decode(tok.encode(s)) == s


def test_encode_equals_sequential_merge_application(tok):
    """Greedy min-rank encoding must equal applying each merge pass in
    rank order — the BPE definition."""
    def sequential(piece):
        ids = list(piece.encode("utf-8"))
        for rank, (a, b) in enumerate(tok.merges):
            out, i = [], 0
            while i < len(ids):
                if i + 1 < len(ids) and ids[i] == a and ids[i + 1] == b:
                    out.append(256 + rank)
                    i += 2
                else:
                    out.append(ids[i])
                    i += 1
            ids = out
        return ids

    for piece in ["the", "quick", "again", "jumps", "zzz", "q"]:
        assert tok.encode_piece(piece) == sequential(piece)


def test_spark_encode_catalyst_decode_roundtrip(spark, corpus_df, tok):
    res = tokenize(corpus_df, tok).select(
        "text",
        detokenize_col(F.col("tokens"), tok).alias("rt"),
        F.size("tokens").alias("n_tok"),
        F.octet_length("text").alias("n_bytes"),
    )
    rows = res.collect()
    assert len(rows) == len(CORPUS)
    for r in rows:
        assert r["rt"] == r["text"]
        assert 0 < r["n_tok"] <= r["n_bytes"]
    # trained merges actually compress
    assert sum(r["n_tok"] for r in rows) < sum(r["n_bytes"] for r in rows)


def test_decode_plan_is_pure_catalyst(spark, corpus_df, tok):
    """The cheap direction (decode) must not leave the JVM; encode is
    the sanctioned Arrow kernel (MapInArrow — no pandas conversion),
    never row-at-a-time."""
    enc = tokenize(corpus_df, tok)
    plan_enc = enc._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan_enc
    assert "MapInArrow" in plan_enc
    toks_df = spark.createDataFrame(
        [([104, 105],)],
        T.StructType([T.StructField("tokens", T.ArrayType(T.IntegerType()))]),
    )
    pure = toks_df.select(detokenize_col(F.col("tokens"), tok).alias("s"))
    plan_pure = pure._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan_pure
    assert pure.collect()[0]["s"] == "hi"


def test_null_and_empty_text(spark, tok):
    df = spark.createDataFrame(
        [(0, None), (1, "")],
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]),
    )
    rows = {r["doc_id"]: r for r in tokenize(df, tok).collect()}
    assert rows[0]["tokens"] == [] and rows[1]["tokens"] == []


def test_tokenize_documents_native_shape(spark, corpus_df, tok):
    """Output is the pipeline's pre-tokenized input shape
    (doc_id, tokens:array<int32>, n_tok:int32, source)."""
    docs = corpus_df.withColumn("source", F.lit("src0"))
    out = tokenize_documents(docs, tok)
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        ("doc_id", "bigint"),
        ("tokens", "array<int>"),
        ("n_tok", "int"),
        ("source", "string"),
    ]
    r = out.orderBy("doc_id").first()
    assert r["n_tok"] == len(r["tokens"]) > 0


def test_vocab_saturation_stops_early(spark):
    """A corpus whose every word fully merges stops producing merges —
    no padding of the merge list past usefulness."""
    df = spark.createDataFrame(
        [(0, "ab ab ab")],
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]),
    )
    tok = train_bpe(df, num_merges=1000)
    assert len(tok.merges) < 10
    assert tok.encode("ab ab") == [tok.encode_piece("ab")[0],
                                   tok.encode(" ")[0],
                                   tok.encode_piece("ab")[0]]


def test_text_to_routed_pipeline_composes(spark):
    """The missing front door, composed end-to-end: RAW TEXT -> trained
    BPE -> the pipeline's native (doc_id, tokens, n_tok, source) shape
    -> the flagship parse->enrich->route->aggregate plan. Token arrays
    must survive routing byte-exactly: decoding every routed row's
    payload reproduces the original document text."""
    from pyspark.sql import functions as F

    from grove_spark.fixtures.generator import gen_sinks_dim, gen_sources_dim
    from grove_spark.plans.pipeline import build_pipeline

    texts = [
        (i, ["okta", "github", "slack"][i % 3],
         f"user u{i} logged in from host h{i % 7} with status ok")
        for i in range(60)
    ]
    docs = spark.createDataFrame(texts, "doc_id long, source string, text string")
    tok = train_bpe(docs, num_merges=128)
    seq = tokenize_documents(docs, tok).withColumn(
        "event_time",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")),
    )
    sources = spark.createDataFrame(gen_sources_dim())
    sinks = spark.createDataFrame(gen_sinks_dim())
    res = build_pipeline(seq, sources, sinks, n_partitions=4)

    # per-sink counts: okta routes to logs/processed/archive (i%3==0 in
    # the dim), github+slack to logs/processed
    counts = {r["descriptor"]: r["rows"] for r in res.counts.collect()}
    assert counts["logs"] == 60 and counts["processed"] == 60
    assert counts["archive"] == 20  # okta docs only

    routed = res.routed.select(
        "doc_id", detokenize_col(F.col("routed_tokens"), tok).alias("rt")
    )
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    rows = routed.collect()
    assert len(rows) == 140  # 60+60+20 fan-out
    for r in rows:
        assert r["rt"] == orig[r["doc_id"]]


def test_save_load_roundtrip(tmp_path, tok):
    """Persisted vocab reloads byte-identically (the trained tokenizer
    is a managed artifact: ids from a reloaded instance must match the
    trainer's exactly or stored token columns become garbage)."""
    p = str(tmp_path / "bpe.json")
    tok.save(p)
    tok2 = BPETokenizer.load(p)
    assert tok2.merges == tok.merges
    assert tok2.encode("the quick brown fox") == tok.encode("the quick brown fox")
    import json
    bad = str(tmp_path / "bad.json")
    with open(bad, "w") as f:
        json.dump({"format": "other"}, f)
    with pytest.raises(ValueError, match="not a grove BPE"):
        BPETokenizer.load(bad)
    # well-formed but corrupt: merge 0 references a not-yet-defined id
    corrupt = str(tmp_path / "corrupt.json")
    with open(corrupt, "w") as f:
        json.dump({"format": "grove-bpe-v1", "merges": [[300, 5]]}, f)
    with pytest.raises(ValueError, match="invalid merge pair"):
        BPETokenizer.load(corrupt)


def test_streaming_tokenize(spark, tmp_path, tok):
    """The streaming front door: a text STREAM tokenizes through the
    same stateless Arrow kernel (mapInPandas is streamable) and decodes
    back exactly — text in, the pipeline's token arrays out, micro-batch
    by micro-batch."""
    import json
    import os

    src = tmp_path / "src"
    src.mkdir()
    rows = [{"doc_id": i, "text": f"stream doc d{i} from the fox"} for i in range(20)]
    with open(src / "a.json", "w") as f:
        for r in rows[:10]:
            f.write(json.dumps(r) + "\n")
    with open(src / "b.json", "w") as f:
        for r in rows[10:]:
            f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .json(str(src))
    )
    toks = tokenize(stream, tok)
    assert toks.isStreaming
    q = (
        toks.writeStream.format("memory")
        .queryName("tok_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM tok_stream").collect()
    assert len(out) == 20
    for r in out:
        assert tok.decode(r["tokens"]) == f"stream doc d{r['doc_id']} from the fox"


def test_run_tokenize_ingest_resumes_exactly_once(spark, tmp_path):
    """The front door as a resumable ingest: run 1 tokenizes the initial
    documents and trains+saves the vocab; new files land; run 2 loads
    the SAME vocab, file-prunes to the new data, and appends only the
    new docs — no loss, no dupes, stable token ids, footer stats in the
    manifest."""
    import os

    from grove_spark.operators.tokenizer import run_tokenize_ingest
    from grove_spark.state.runstate import RunState

    src = str(tmp_path / "docs")
    out = str(tmp_path / "seq")
    vocab = str(tmp_path / "bpe.json")
    state = RunState(str(tmp_path / "state"))

    def docs_df(lo, hi):
        return spark.createDataFrame(
            [(i, f"src{i % 2}", f"doc number d{i} says the fox ran")
             for i in range(lo, hi)],
            "doc_id long, source string, text string",
        )

    docs_df(0, 50).coalesce(2).write.parquet(src)
    r1 = run_tokenize_ingest(spark, src, state, out, vocab)
    assert r1["rows"] == 50 and r1["pointer"] == "49"
    assert os.path.exists(vocab)

    # append-only growth: two new files
    docs_df(50, 80).coalesce(2).write.mode("append").parquet(src)
    r2 = run_tokenize_ingest(spark, src, state, out, vocab)
    assert r2["rows"] == 30 and r2["pointer"] == "79"
    assert r2["tokenizer"].merges == r1["tokenizer"].merges  # vocab reuse
    # pruning engaged: run 2 listed a strict subset of source files
    m = state.run_record(r2["run_id"])
    assert m["metrics"]["scan"]["files_kept"] < m["metrics"]["scan"]["files_total"]
    assert m.get("file_stats"), "writer footer stats missing from commit"

    # committed outputs: every doc exactly once, ids decode stably
    seq = spark.read.option("basePath", out).parquet(*state.committed_paths())
    assert seq.count() == 80
    assert seq.select("doc_id").distinct().count() == 80
    row = seq.where("doc_id = 7").first()
    assert r2["tokenizer"].decode(row["tokens"]) == "doc number d7 says the fox ran"

    # idempotent: nothing new -> empty run, pointer unchanged
    r3 = run_tokenize_ingest(spark, src, state, out, vocab)
    assert r3["rows"] == 0 and r3["pointer"] == "79"
    assert spark.read.option("basePath", out).parquet(*state.committed_paths()).count() == 80


def test_tokenize_ingest_empty_first_batch_does_not_poison_vocab(spark, tmp_path):
    """An empty first batch must NOT train-and-persist a 0-merge
    vocabulary (the train-once policy would load it forever): the tick
    commits nothing, and the first real batch trains normally."""
    import os

    from grove_spark.operators.tokenizer import run_tokenize_ingest
    from grove_spark.state.runstate import RunState

    src = str(tmp_path / "docs")
    out = str(tmp_path / "seq")
    vocab = str(tmp_path / "bpe.json")
    state = RunState(str(tmp_path / "state"))
    empty = spark.createDataFrame([], "doc_id long, source string, text string")
    empty.coalesce(1).write.parquet(src)

    r0 = run_tokenize_ingest(spark, src, state, out, vocab)
    assert r0["rows"] == 0 and r0["tokenizer"] is None
    assert not os.path.exists(vocab), "empty batch persisted a vocab"

    spark.createDataFrame(
        [(i, "s", f"real doc d{i} of the corpus") for i in range(10)],
        "doc_id long, source string, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    r1 = run_tokenize_ingest(spark, src, state, out, vocab)
    assert r1["rows"] == 10 and len(r1["tokenizer"].merges) > 0
    assert os.path.exists(vocab)
