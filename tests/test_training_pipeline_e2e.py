"""The user-story test: a raw corpus goes through the FULL training-data
pipeline — normalize -> line-level dedup -> near-dup clustering ->
benchmark decontamination -> PII redaction -> LM quality scoring ->
mixture sampling -> sequence packing — with planted artifacts at every
stage proving each operator did its job on the composed stream, not just
in isolation."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    # 200 base docs over a small vocab; planted artifacts:
    # - docs 0..9: exact near-duplicates of doc 100 (cluster -> 1 keeper)
    # - every doc_id%7==0 doc carries the same banner line (line dedup)
    # - docs 20, 21 contain the benchmark probe string (decontamination)
    # - docs 30, 31 contain an email address (PII redaction)
    def body_of(i):
        # distinct per doc: a hashed walk over a 4096-token space keeps
        # cross-doc shingle overlap near zero (so only the PLANTED
        # copies are near-dups and max_df has no boilerplate to cap)
        return " ".join(
            f"w{(i * 2654435761 + j * 40503) % 4096}" for j in range(40)
        )

    rows = []
    for i in range(200):
        body = body_of(100) if i < 10 else body_of(i)
        if i % 7 == 0:
            body = "all rights reserved banner line\n" + body
        if i in (20, 21):
            body += " the secret benchmark probe sequence twelve thirteen " \
                    "fourteen fifteen sixteen seventeen eighteen nineteen"
        if i in (30, 31):
            body += " contact us at ops@example.com for details"
        rows.append((i, f"src{i % 3}", body))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_full_pipeline_composes(spark, corpus):
    from grove_spark.functions.text import normalize_text_expr
    from grove_spark.operators.dedup import dedup_lines
    from grove_spark.operators.dedup_cluster import dedup_clusters
    from grove_spark.operators.dedup_fuzzy import minhash_dedup_pairs
    from grove_spark.operators.decontaminate import decontaminate
    from grove_spark.operators.packing import (
        mixture_sample,
        ngram_lm_score,
        pack_sequences,
    )
    from grove_spark.operators.redact import redact

    # 1. normalize — but BEFORE line dedup only the line-safe parts:
    # collapse_ws folds '\n' into spaces, so running it first would
    # destroy the very boundaries the boilerplate pass keys on (pipeline
    # ordering: line ops precede whitespace collapse)
    normed = corpus.select(
        "doc_id", "source",
        normalize_text_expr(
            "text", strip_punct=False, collapse_ws=False
        ).alias("text"),
    )

    # 2. line-level dedup drops the shared banner from every carrier.
    # min_count sits ABOVE the near-dup cluster size: at min_count=2 the
    # 11 planted copies' shared body lines would be eaten as
    # "boilerplate" before near-dup dedup ever saw them (the CCNet-style
    # pass uses high document-frequency thresholds for exactly this
    # reason — boilerplate is in MANY docs, duplicates in a few)
    lines = dedup_lines(normed, min_count=15)
    assert lines.where(F.col("text_kept").contains("banner")).count() == 0
    base = (
        normed.drop("text")
        .join(lines.selectExpr("doc_id", "text_kept AS text"), "doc_id")
    )

    # 3. near-dup clustering: the 11 planted copies collapse to 1 keeper
    pairs = minhash_dedup_pairs(base, threshold=0.8)
    clustered = dedup_clusters(pairs, base)
    planted = clustered.where(F.col("doc_id").isin(*range(10), 100))
    assert planted.where("is_keeper").count() == 1
    kept = base.join(
        clustered.where("is_keeper").select("doc_id"), "doc_id", "left_semi"
    )

    # 4. decontamination removes the two probe-carrying docs
    bench = spark.createDataFrame(
        [("the secret benchmark probe sequence twelve thirteen fourteen "
          "fifteen sixteen seventeen eighteen nineteen",)],
        "text string",
    )
    clean = decontaminate(kept, bench, n=8)
    assert clean.where(F.col("doc_id").isin(20, 21)).count() == 0

    # 5. PII redaction masks the planted email
    red, _obs = redact(clean, text_col="text")
    assert red.where(F.col("text").contains("ops@example.com")).count() == 0
    assert red.where(F.col("doc_id").isin(30, 31)) \
              .where(F.col("text").contains("<EMAIL>")).count() == 2

    # 6. LM scoring: every surviving doc is scored, and an
    # out-of-vocabulary probe scores strictly WORSE than every real doc
    # (the signal the perplexity filter exists for)
    oov = spark.createDataFrame(
        [(9999, "src0", " ".join(f"zz{j}" for j in range(40)))],
        "doc_id long, source string, text string",
    )
    scored = ngram_lm_score(red.unionByName(oov), red)
    assert scored.count() == red.count() + 1
    assert scored.where(F.col("n_bigrams") > 0) \
        .where(F.col("mean_log2p").isNull()).count() == 0
    rows = {r.doc_id: r.mean_log2p for r in scored.collect()}
    oov_score = rows.pop(9999)
    assert all(oov_score < v for v in rows.values() if v is not None)

    # 7. mixture to a token budget, 8. pack into trainer bins
    toks = red.select(
        "doc_id", "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    mixed = mixture_sample(
        toks, {"src0": 1.0, "src1": 1.0, "src2": 1.0}, token_budget=4000
    )
    assert mixed.count() > 0
    packed = pack_sequences(
        mixed.withColumn("doc_id", F.col("doc_id").cast("string")),
        capacity=512, by=("source",), length_col="n_tokens",
        order_col="doc_id",
    )
    bins = packed.groupBy("source", "bin").agg(F.sum("n_tokens").alias("fill"))
    # the straddle rule, actually asserted: with M = max doc tokens,
    # every NON-LAST bin per source fills to at least capacity - (M-1)
    # (the boundary doc straddles into the next bin) and no bin exceeds
    # capacity + (M-1); bins are contiguous from 0
    M = mixed.agg(F.max("n_tokens")).first()[0]
    per = {(r["source"], r["bin"]): r["fill"] for r in bins.collect()}
    last = {s: max(b for (s2, b) in per if s2 == s) for s in
            {s for (s, _b) in per}}
    for (src, b), fill in per.items():
        assert fill <= 512 + (M - 1), (src, b, fill)
        if b != last[src]:
            assert fill >= 512 - (M - 1), (src, b, fill)
    for src, mx in last.items():
        assert {b for (s2, b) in per if s2 == src} == set(range(mx + 1))
