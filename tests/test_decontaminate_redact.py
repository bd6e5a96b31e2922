"""Benchmark decontamination + PII redaction operators."""

import pytest
from pyspark.sql import functions as F

from grove_spark.operators.decontaminate import contamination_scores, decontaminate
from grove_spark.operators.redact import DEFAULT_RULES, redact, redaction_expr

BENCH_SENT = "the quick brown fox jumps over the lazy dog near the river bank today"


@pytest.fixture()
def corpus(spark):
    rows = [
        # d1 embeds the full benchmark sentence (13+ words): contaminated
        (1, "intro words then " + BENCH_SENT + " and some trailing text"),
        # d2 shares only a short prefix (< 13 words): clean
        (2, "the quick brown fox sat still while everything else was different here"),
        # d3 totally unrelated
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"),
        # d4 too short to have any 13-gram
        (4, "tiny doc"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


@pytest.fixture()
def bench_set(spark):
    return spark.createDataFrame([(BENCH_SENT,)], "text string")


def test_contamination_scores(corpus, bench_set):
    s = {r["doc_id"]: r for r in contamination_scores(corpus, bench_set).collect()}
    assert set(s) == {1, 2, 3, 4}, "every corpus doc gets a score row"
    assert s[1]["n_contaminated"] >= 1 and s[1]["contaminated_frac"] > 0
    assert s[2]["n_contaminated"] == 0
    assert s[3]["n_contaminated"] == 0
    assert s[4]["n_grams"] == 0 and s[4]["contaminated_frac"] == 0.0


def test_decontaminate_strict_rule(corpus, bench_set):
    kept = sorted(r["doc_id"] for r in decontaminate(corpus, bench_set).collect())
    assert kept == [2, 3, 4], "only the doc embedding a benchmark 13-gram drops"


def test_decontaminate_threshold(corpus, bench_set):
    # with a fraction threshold above d1's overlap, nothing drops
    kept = decontaminate(corpus, bench_set, threshold=0.99).count()
    assert kept == 4


def test_decontaminate_shuffle_join_path(corpus, bench_set):
    kept = sorted(
        r["doc_id"]
        for r in decontaminate(corpus, bench_set, broadcast_benchmark=False).collect()
    )
    assert kept == [2, 3, 4]


def test_redact_masks_and_counts(spark):
    rows = [
        (1, "mail alice@example.com or bob.smith+x@corp.io, call 555-123-4567"),
        (2, "ssn 123-45-6789 ip 10.0.0.1 key sk-ABCDEFGHIJKLMNOP1234"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out, obs = redact(df, "text")
    got = {r["id"]: r["text"] for r in out.collect()}
    assert got[1] == "mail <EMAIL> or <EMAIL>, call <PHONE>"
    assert got[2] == "ssn <SSN> ip <IP> key <KEY>"
    assert got[3] == "nothing sensitive here"
    m = obs.get
    assert m["email_hits"] == 2 and m["phone_hits"] == 1
    assert m["ssn_hits"] == 1 and m["ipv4_hits"] == 1 and m["api_key_hits"] == 1


def test_redact_out_col_and_plan(spark):
    df = spark.createDataFrame([(1, "x@y.io")], "id int, text string")
    out, _ = redact(df, "text", out_col="clean", with_counts=False)
    r = out.first()
    assert r["text"] == "x@y.io" and r["clean"] == "<EMAIL>"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, "redaction must stay JVM-side"


def test_redaction_expr_rule_order(spark):
    # an SSN is NOT eaten by the phone rule (ssn applies first)
    df = spark.createDataFrame([("a 123-45-6789 b",)], "text string")
    got = df.select(redaction_expr(F.col("text")).alias("t")).first()["t"]
    assert got == "a <SSN> b"


def test_default_rules_are_re2_safe():
    """Patterns must stay in the Java∩RE2 subset (no backrefs or
    lookaround) so the DuckDB oracle and other engines can run them."""
    for name, pat, _ in DEFAULT_RULES:
        assert "(?=" not in pat and "(?!" not in pat and "\\1" not in pat, name


def test_contamination_scores_stream_matches_batch(spark, tmp_path, corpus, bench_set):
    """The streaming scorer (stream-static broadcast join + watermarked
    per-doc agg, append mode) must agree with the batch twin on every
    document long enough to shingle; short docs are absent-by-contract
    (absent = clean)."""
    import json

    from grove_spark.operators.decontaminate import contamination_scores_stream

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "docs.json", "w") as f:
        for r in corpus.collect():
            f.write(json.dumps({
                "doc_id": r["doc_id"], "text": r["text"],
                "event_time": f"2024-01-01T00:00:{r['doc_id']:02d}",
            }) + "\n")
    # append mode emits a doc's row only once the watermark passes its
    # event time: a far-future sentinel in a SECOND file (its own batch)
    # advances the watermark so every real doc flushes; the sentinel
    # itself stays in state, absent from the output
    with open(src / "flush.json", "w") as f:
        f.write(json.dumps({
            "doc_id": 99, "text": " ".join(f"s{i}" for i in range(15)),
            "event_time": "2024-01-01T06:00:00",
        }) + "\n")

    stream = (
        spark.readStream.schema("doc_id int, text string, event_time timestamp")
        .json(str(src))
    )
    scored = contamination_scores_stream(
        stream, bench_set, time_col="event_time", delay="1 minute"
    )
    assert scored.isStreaming
    q = (
        scored.writeStream.format("memory")
        .queryName("decon_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["n_grams"], r["n_contaminated"])
        for r in spark.sql("SELECT * FROM decon_stream").collect()
    }
    want = {
        r["doc_id"]: (r["n_grams"], r["n_contaminated"])
        for r in contamination_scores(corpus, bench_set).collect()
        if r["n_grams"] > 0  # short docs: absent in streaming by contract
    }
    assert got == want
    # too-short docs (d4: 2 words, d2: 12 words < n=13) are absent
    assert 4 not in got and 2 not in got
    assert got[1][1] > 0 and got[3][1] == 0  # planted hit / unrelated doc
    assert 99 not in got  # the unflushed sentinel

    # cache lifecycle (ADVICE r4): the persisted benchmark-grams frame
    # rides on the returned stream frame so callers can unpersist it
    # when the query stops, instead of leaking one cached copy per call
    bench_grams = scored.benchmark_grams
    assert bench_grams.storageLevel.useMemory
    bench_grams.unpersist(blocking=True)
    assert not bench_grams.storageLevel.useMemory

    # a caller-owned pre-built grams frame is used as-is (no new cache)
    scored2 = contamination_scores_stream(
        stream, bench_set, time_col="event_time", delay="1 minute",
        benchmark_grams=bench_grams,
    )
    assert scored2.benchmark_grams is bench_grams
    assert not bench_grams.storageLevel.useMemory
