"""Sequence packing, stratified sampling, repetition signals."""

import pytest
from pyspark.sql import functions as F

from grove_spark.operators.packing import (
    pack_sequences,
    pack_stats,
    repetition_signals,
    stratified_sample,
)


def test_pack_sequences_bins_and_straddle(spark):
    rows = [
        ("s", 1, 3000), ("s", 2, 3000),  # doc2 starts at 3000 -> bin 0 (straddles)
        ("s", 3, 3000),                  # starts at 6000 -> bin 1
        ("s", 4, 100),                   # starts at 9000 -> bin 2
        ("t", 9, 5000),                  # own partition: starts at 0 -> bin 0
        ("t", 10, 1),                    # starts at 5000 -> bin 1
    ]
    df = spark.createDataFrame(rows, "source string, doc_id int, n_tok int")
    packed = pack_sequences(df, length_col="n_tok", capacity=4096,
                            order_col="doc_id", by=["source"])
    got = {(r["source"], r["doc_id"]): r["bin"] for r in packed.collect()}
    assert got == {("s", 1): 0, ("s", 2): 0, ("s", 3): 1, ("s", 4): 2,
                   ("t", 9): 0, ("t", 10): 1}
    stats = {(r["source"], r["bin"]): (r["n_docs"], r["fill"])
             for r in pack_stats(packed, by=["source"]).collect()}
    assert stats[("s", 0)] == (2, 6000) and stats[("t", 1)] == (1, 1)


def test_pack_sequences_global_window_guard(spark):
    """by=() is a one-task global window — refused unless the caller
    opts in, and even then it warns (VERDICT r4 #5)."""
    df = spark.createDataFrame(
        [("s", 1, 10), ("s", 2, 20)], "source string, doc_id int, n_tok int"
    )
    with pytest.raises(ValueError, match="GLOBAL window"):
        pack_sequences(df, length_col="n_tok", by=())
    with pytest.warns(UserWarning, match="single task"):
        packed = pack_sequences(df, length_col="n_tok", by=(),
                                capacity=4096, allow_global=True)
    assert {r["bin"] for r in packed.collect()} == {0}


def test_stratified_sample_deterministic_and_rated(spark):
    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("source"),
    )
    s1 = stratified_sample(df, {"a": 0.1, "b": 0.8}, id_col="doc_id")
    s2 = stratified_sample(df, {"a": 0.1, "b": 0.8}, id_col="doc_id")
    r1 = sorted(r["doc_id"] for r in s1.collect())
    assert r1 == sorted(r["doc_id"] for r in s2.collect()), "must be rerun-stable"
    by_src = {r["source"]: r["n"] for r in
              s1.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert abs(by_src["a"] / 5000 - 0.1) < 0.02
    assert abs(by_src["b"] / 5000 - 0.8) < 0.02
    # default_rate=0 drops unlisted strata entirely
    assert stratified_sample(df, {"a": 0.1}, id_col="doc_id").where(
        "source = 'b'").count() == 0


def test_repetition_signals(spark):
    rows = [
        (1, "spam spam spam spam spam spam"),                 # degenerate
        (2, "buy now buy now buy now buy now"),               # looping bigram
        (3, "a perfectly ordinary sentence with unique words entirely"),
        (4, "solo"),                                          # no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert got[1]["is_repetitive"] and got[1]["dup_word_frac"] > 0.8
    assert got[2]["is_repetitive"] and got[2]["top_bigram_frac"] > 0.2
    assert not got[3]["is_repetitive"]
    assert got[4]["top_bigram_frac"] == 0.0 and not got[4]["is_repetitive"]


def test_stratified_sample_signed_and_huge_ids(spark):
    """xxhash64-style ids are signed and near 2^63: pmod keeps negative
    ids at their stratum's rate (plain % admitted them at 100%) and the
    reduced multiply cannot overflow under ANSI mode."""
    from pyspark.sql import functions as F

    df = spark.range(20_000).select(
        (F.xxhash64(F.col("id").cast("string"))).alias("doc_id"),
        F.lit("a").alias("source"),
    )
    n_neg = df.where("doc_id < 0").count()
    assert n_neg > 5000, "fixture should have plenty of negative ids"
    kept = stratified_sample(df, {"a": 0.2}, id_col="doc_id")
    frac = kept.count() / 20_000
    assert abs(frac - 0.2) < 0.02, f"rate off: {frac}"
    neg_frac = kept.where("doc_id < 0").count() / n_neg
    assert abs(neg_frac - 0.2) < 0.03, f"negative ids sampled at {neg_frac}"


def test_mixture_sample_up_down_and_absent(spark):
    from grove_spark.operators.packing import mixture_sample

    rows = [(i, "a" if i < 100 else "b" if i < 200 else "c", 10)
            for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")
    # budget 2000 tokens, weights a:3 b:1 (c unweighted -> dropped).
    # avail per source = 1000 tokens. a's share = 1500 -> rate 1.5
    # (1 full epoch + ~50% fractional); b's share = 500 -> rate 0.5.
    out = mixture_sample(docs, {"a": 3.0, "b": 1.0}, 2000)
    per = {r["source"]: r for r in
           out.groupBy("source").agg(
               F.count(F.lit(1)).alias("n"),
               F.max("epoch").alias("max_e")).collect()}
    assert "c" not in per
    assert per["a"]["max_e"] == 1 and 120 <= per["a"]["n"] <= 180
    assert per["b"]["max_e"] == 0 and 30 <= per["b"]["n"] <= 70
    # deterministic: rerun picks the same rows
    again = mixture_sample(docs, {"a": 3.0, "b": 1.0}, 2000)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    # plan: totals dim joins via broadcast, no driver collect needed
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "SortMergeJoin" not in plan

    with pytest.raises(ValueError):
        mixture_sample(docs, {"a": 1.0}, 0)
    with pytest.raises(ValueError):
        mixture_sample(docs, {}, 100)


def test_mixture_sample_zero_mass_source_contributes_nothing(spark):
    """ADVICE r3: a weighted source whose rows all have zero/null token
    counts must yield zero rows (not an Infinity rate -> ANSI overflow
    in floor(), or an enormous epoch explode)."""
    from grove_spark.operators.packing import mixture_sample

    rows = [(i, "a", 10) for i in range(100)] + [
        (100 + i, "z", 0) for i in range(50)
    ] + [(200 + i, "n", None) for i in range(50)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens int"
    )
    out = mixture_sample(docs, {"a": 1.0, "z": 1.0, "n": 1.0}, 1000)
    per = {r["source"]: r["n"] for r in out.groupBy("source")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "z" not in per and "n" not in per
    assert per["a"] > 0


def test_global_token_shards_exact_and_partition_invariant(spark):
    """The two-pass distributed prefix sum must equal the exact global
    cumsum (single-stream reference) and be INVARIANT to how many range
    partitions computed it — the property that makes it the scalable
    replacement for the refused global window."""
    from grove_spark.operators.packing import global_token_shards

    df = spark.range(0, 5000).selectExpr(
        "id AS doc_id", "CAST(id % 89 + 1 AS int) AS n_tok"
    )
    ref = None
    for n_parts in (2, 7, 16):
        res = global_token_shards(df, budget_tokens=3000, n_parts=n_parts)
        pdf = res.orderBy("doc_id").toPandas()
        res._grove_persisted.unpersist()
        cum = pdf["n_tok"].cumsum() - pdf["n_tok"]
        assert (pdf["shard"].to_numpy() == (cum // 3000).to_numpy()).all()
        if ref is None:
            ref = pdf["shard"].to_numpy()
        else:
            assert (pdf["shard"].to_numpy() == ref).all(), n_parts
    # budget respected up to one straddling sequence
    sums = pdf.groupby("shard")["n_tok"].sum()
    assert sums.max() <= 3000 + 88
    # rows preserved, no Python in the plan
    assert len(pdf) == 5000
    res = global_token_shards(df, budget_tokens=3000, n_parts=4)
    plan = res._jdf.queryExecution().executedPlan().toString()
    res._grove_persisted.unpersist()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_global_token_shards_nulls_and_empty(spark):
    from grove_spark.operators.packing import global_token_shards

    df = spark.createDataFrame(
        [(0, 10), (1, None), (2, 20)], "doc_id long, n_tok int"
    )
    res = global_token_shards(df, budget_tokens=15)
    rows = {r["doc_id"]: r["shard"] for r in res.collect()}
    res._grove_persisted.unpersist()
    # null length counts as 0: doc 1 starts where doc 0 ended
    assert rows == {0: 0, 1: 0, 2: 0}

    empty = df.where("doc_id < 0")
    res = global_token_shards(empty, budget_tokens=15)
    assert res.count() == 0 and "shard" in res.columns
    res._grove_persisted.unpersist()
