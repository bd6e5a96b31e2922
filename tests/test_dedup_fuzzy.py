"""Near-dup detection: planted duplicates must be found; clean corpora
must not produce false positives at high thresholds."""

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from grove_spark.operators.dedup_fuzzy import (
    embedding_near_pairs,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
    word_shingles,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("warm windowsill", "cold windowsill")  # 1-word edit
FAR = (
    "completely different text about spark dataframes shuffles and "
    "broadcast joins at terabyte scale with adaptive query execution"
)

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, FAR), (4, BASE)], schema=SCHEMA
    )


def test_word_shingles(spark, docs):
    sh = word_shingles(docs.where("doc_id = 3"), n=3).collect()
    words = FAR.split(" ")
    assert len(sh) == len(words) - 2
    assert sh[0]["shingle"] == "completely different text"


def test_word_shingles_short_docs_dont_crash(spark):
    """Docs with fewer than n words yield no shingles (and must not hit
    Spark's descending sequence(0,-1) + slice(_, 0, n) runtime error)."""
    df = spark.createDataFrame(
        [(1, "two words"), (2, "one"), (3, ""), (4, "exactly three words")],
        schema=SCHEMA,
    )
    rows = word_shingles(df, n=3).collect()
    assert {r["doc_id"] for r in rows} == {4}
    assert rows[0]["shingle"] == "exactly three words"
    # and the full pipelines survive a short doc mixed into the corpus
    mixed = spark.createDataFrame([(1, BASE), (2, BASE), (3, "hi")], schema=SCHEMA)
    got = {(r["a"], r["b"]) for r in minhash_dedup_pairs(mixed, threshold=0.5).collect()}
    assert got == {(1, 2)}
    got2 = {(r["a"], r["b"]) for r in ngram_jaccard_pairs(mixed, threshold=0.5).collect()}
    assert got2 == {(1, 2)}


def test_ngram_jaccard_max_df_drops_boilerplate(spark):
    """A shingle present in every doc (boilerplate) is excluded from both
    the join and the Jaccard denominator when max_df caps it."""
    boiler = "copyright acme corp all rights reserved"
    df = spark.createDataFrame(
        [(1, f"{BASE} {boiler}"), (2, f"{NEAR} {boiler}"), (3, f"{FAR} {boiler}")],
        schema=SCHEMA,
    )
    with_cap = {(r["a"], r["b"]) for r in ngram_jaccard_pairs(df, threshold=0.5, max_df=2).collect()}
    assert (1, 2) in with_cap and not any(3 in p for p in with_cap)


def test_ngram_jaccard_finds_planted_pairs(spark, docs):
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    assert (1, 4) in got  # exact dup
    assert (1, 2) in got and (2, 4) in got  # near dup
    assert not any(3 in p for p in got)  # unrelated doc clean
    exact = [r for r in pairs if (r["a"], r["b"]) == (1, 4)][0]
    assert exact["common"] == exact["n_a"] == exact["n_b"]


def test_minhash_exact_dup_identical_signature(spark, docs):
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs, num_hashes=32).collect()}
    assert sigs[1] == sigs[4]
    assert sigs[1] != sigs[3]
    # near-dup signatures mostly agree
    agree = sum(1 for a, b in zip(sigs[1], sigs[2]) if a == b) / 32
    assert agree > 0.5


def test_minhash_lsh_pipeline(spark, docs):
    pairs = {(r["a"], r["b"]) for r in
             minhash_dedup_pairs(docs, threshold=0.5, num_hashes=32, bands=8).collect()}
    assert (1, 4) in pairs and (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_lsh_bucket_cap_drops_degenerate_cluster(spark):
    boiler = [(i, BASE) for i in range(20)]
    df = spark.createDataFrame(boiler, schema=SCHEMA)
    sigs = minhash_signatures(df, num_hashes=32)
    # cap below the cluster size: no candidates survive
    assert lsh_candidate_pairs(sigs, bands=8, rows_per_band=4, max_bucket_size=10).count() == 0
    # without the cap: full quadratic pair set
    assert lsh_candidate_pairs(sigs, bands=8, rows_per_band=4, max_bucket_size=0).count() == 190


def test_bucket_cap_drop_is_surfaced_not_silent(spark, docs):
    """VERDICT r3 #4: the cap's effect must be observable — telemetry
    reports how many band-buckets (and doc entries) were dropped, while
    pairs OUTSIDE the degenerate cluster still come through."""
    from grove_spark.operators.dedup_fuzzy import minhash_dedup_pairs

    # the planted near-dup corpus plus a 12-doc identical boilerplate
    # cluster (a DIFFERENT text, so only its own buckets blow the cap)
    boiler = [(100 + i, FAR) for i in range(12)]
    df = docs.unionByName(spark.createDataFrame(boiler, schema=SCHEMA))
    tele = {}
    pairs = minhash_dedup_pairs(
        df, threshold=0.7, num_hashes=32, bands=8,
        max_bucket_size=10, telemetry=tele,
    )
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert tele["buckets_dropped"] > 0, "cap engaged but not surfaced"
    assert tele["entries_dropped"] >= 12
    assert tele["buckets_total"] > tele["buckets_dropped"]
    assert tele["max_bucket_size"] == 10
    # degenerate-cluster pairs are gone; the planted near-dup survives
    assert all(a < 100 for a, _ in got)
    assert (1, 4) in got
    # telemetry with NO drop: zeros, not missing keys
    tele2 = {}
    minhash_dedup_pairs(
        docs, threshold=0.7, num_hashes=32, bands=8,
        max_bucket_size=1000, telemetry=tele2,
    ).collect()
    assert tele2["buckets_dropped"] == 0 and tele2["buckets_total"] > 0


def test_embedding_bucket_cap_telemetry(spark):
    """Same surfacing contract for the hyperplane-LSH backstop."""
    from grove_spark.operators.dedup_fuzzy import embedding_near_pairs

    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(9)] + [
        (100, [0.0, 1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.001, 0.0])
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    tele = {}
    pairs = embedding_near_pairs(
        emb, threshold=0.9, n_planes=4, max_bucket_size=5, telemetry=tele
    )
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert tele["buckets_dropped"] >= 1 and tele["entries_dropped"] >= 9
    assert (100, 101) in got, "pair outside the dropped bucket lost"
    assert all(a >= 100 for a, _ in got)


def test_simhash_near_pairs(spark, docs):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sigs[1] == sigs[4]
    pairs = {(r["a"], r["b"]) for r in simhash_near_pairs(docs, max_distance=6).collect()}
    assert (1, 4) in pairs
    assert (1, 3) not in pairs and (3, 4) not in pairs


def test_embedding_near_pairs(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    v1 = rng.standard_normal(16)
    v2 = v1 + rng.standard_normal(16) * 0.01  # near-dup
    v3 = rng.standard_normal(16)  # unrelated
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    df = spark.createDataFrame(
        [(1, [float(x) for x in v1]), (2, [float(x) for x in v2]), (3, [float(x) for x in v3])],
        schema=schema,
    )
    pairs = embedding_near_pairs(df, threshold=0.95, n_planes=4).collect()
    assert {(r["a"], r["b"]) for r in pairs} == {(1, 2)}


def test_containment_pairs_directional(spark):
    """A short doc fully contained in a longer one must be flagged in the
    contained->container direction even when symmetric Jaccard is far
    below threshold; unrelated docs never pair."""
    from grove_spark.operators.dedup_fuzzy import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    long_ = ("intro words here then " + short +
             " and a very long tail of unrelated filler " +
             " ".join(f"filler{i}" for i in range(40)))
    docs = spark.createDataFrame(
        [(1, short), (2, long_), (3, "completely different text with nothing shared here at all")],
        "doc_id int, text string",
    )
    pairs = ngram_containment_pairs(docs, threshold=0.9)
    got = {(r["contained"], r["container"]): r["containment"] for r in pairs.collect()}
    assert (1, 2) in got and got[(1, 2)] >= 0.9
    assert (2, 1) not in got, "containment is directional"
    assert all(3 not in k for k in got)
    # and Jaccard at the same bar misses it (that's the point)
    j = ngram_jaccard_pairs(docs, threshold=0.9).collect()
    assert not [r for r in j if {r["a"], r["b"]} == {1, 2}]


def test_duplicate_doc_ids_emit_no_self_pairs(spark):
    """A doc id duplicated in the input lands twice in its buckets; the
    bucket-local expansion must not emit (x, x) — the old self-join's
    strict l.doc < r.doc never did (r5 review regression)."""
    from grove_spark.operators.dedup_fuzzy import minhash_dedup_pairs

    rows = [(i, f"alpha beta gamma delta epsilon zeta eta theta doc{i}")
            for i in range(50)]
    rows.append(rows[7])  # same id, same text — dirty upstream data
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    pairs = minhash_dedup_pairs(docs, threshold=0.5).collect()
    assert all(r["a"] != r["b"] for r in pairs)


def test_uncapped_path_is_selfjoin_and_matches_capped(spark):
    """max_bucket_size=0 must NOT use the in-row pair expansion (one
    degenerate bucket would materialize its quadratic pair set inside a
    single array); it keeps the distributed self-join and produces the
    same pairs as a never-engaged cap."""
    from grove_spark.operators.dedup_fuzzy import (
        lsh_candidate_pairs, minhash_signatures)

    rows = [(i, " ".join(f"w{(i * 7 + k) % 23}" for k in range(12)))
            for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    sigs = minhash_signatures(docs, 64, 3)
    uncapped = lsh_candidate_pairs(sigs, 16, 4, max_bucket_size=0)
    plan = uncapped._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan  # expansion path not taken
    capped = lsh_candidate_pairs(sigs, 16, 4, max_bucket_size=10_000)
    assert uncapped.exceptAll(capped).count() == 0
    assert capped.exceptAll(uncapped).count() == 0


def test_xxh64_long_kernel_matches_spark(spark):
    """The numpy XXH64.hashLong replica must be bit-identical to Spark's
    xxhash64 over longs — single-arg (seed 42) and the chained
    two-arg form minhash_signatures uses."""
    import numpy as np

    from grove_spark.operators.dedup_fuzzy import _xxh64_int, _xxh64_long

    vals = np.array(
        [0, 1, -1, 2**63 - 1, -(2**63), 42, 123456789123456789,
         -987654321987654321, 7, -7],
        dtype=np.int64,
    )
    df = spark.createDataFrame([(int(v),) for v in vals], "x long")
    one = [r[0] for r in df.select(F.xxhash64("x")).collect()]
    h0 = _xxh64_long(vals.view(np.uint64), np.uint64(42))
    assert h0.view(np.int64).tolist() == one
    for seed in (0, 1, 31, 63):
        # the seed literal is an INT -> Spark chains XXH64.hashInt
        exp = [r[0] for r in df.select(F.xxhash64("x", F.lit(seed))).collect()]
        got = _xxh64_int(np.uint64(seed), h0)
        assert got.view(np.int64).tolist() == exp, f"seed {seed}"


def test_arrow_minhash_parity_with_catalyst(spark):
    """engine='arrow' signatures are bit-identical to the Catalyst
    executable spec, including short-doc drop semantics."""
    import random

    rows = []
    for i in range(400):
        rng = random.Random(i)
        k = rng.randint(0, 12)  # includes docs with < n words (dropped)
        rows.append((i, " ".join(f"w{rng.randint(0, 60)}" for _ in range(k))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["sig"]
         for r in minhash_signatures(df, 64, 3, engine="arrow").collect()}
    c = {r["doc_id"]: r["sig"]
         for r in minhash_signatures(df, 64, 3, engine="catalyst").collect()}
    assert a == c
    assert len(a) > 100  # the corpus really produced signatures
    a32 = {r["doc_id"]: r["sig"]
           for r in minhash_signatures(df, 32, 3, engine="arrow").collect()}
    c32 = {r["doc_id"]: r["sig"]
           for r in minhash_signatures(df, 32, 3, engine="catalyst").collect()}
    assert a32 == c32


def test_xxh64_bytes_kernel_matches_spark(spark):
    """The vectorized XXH64-over-bytes replica must match F.xxhash64 on
    strings of every length class: empty, <8, 4-byte tail, 1-byte tail,
    8..31, >=32 (stripe path), multi-byte UTF-8, long."""
    import numpy as np

    from grove_spark.operators.dedup_fuzzy import _xxh64_bytes

    strings = [
        "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
        "abcdefghi", "0123456789abcdef", "0123456789abcdef0123456789abcde",
        "0123456789abcdef0123456789abcdef",  # exactly 32
        "0123456789abcdef0123456789abcdef0123",  # 32 + 4
        "0123456789abcdef0123456789abcdefX",  # 32 + 1
        "x" * 100, "héllo wörld ünïcode",  # multi-byte utf-8
        "the quick brown fox jumps over the lazy dog " * 3,
        "a b", " a  b ", "\ttab\nnewline",
    ]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    exp = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    raw = b"".join(s.encode("utf-8") for s in strings)
    data = np.frombuffer(raw, dtype=np.uint8)
    lens = np.array([len(s.encode("utf-8")) for s in strings], dtype=np.int64)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    got = _xxh64_bytes(data, starts, lens).view(np.int64).tolist()
    assert got == exp


def test_hashed_gram_rows_parity(spark):
    """Arrow gram-row kernel vs the Catalyst expression form: identical
    (id, __n, __g) multisets, including null texts, short docs, doubled
    spaces and n=1/n=13."""
    import random

    from grove_spark.operators.dedup_fuzzy import hashed_gram_rows

    rows = []
    for i in range(300):
        rng = random.Random(i * 31)
        k = rng.randint(0, 16)
        words = [f"w{rng.randint(0, 40)}" for _ in range(k)]
        t = " ".join(words)
        if i % 17 == 0:
            t = t + "  doubled  spaces "
        rows.append((i, None if i % 23 == 11 else t))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (1, 3, 13):
        a = sorted(
            (r["doc_id"], r["__n"], r["__g"])
            for r in hashed_gram_rows(df, n, engine="arrow").collect()
        )
        c = sorted(
            (r["doc_id"], r["__n"], r["__g"])
            for r in hashed_gram_rows(df, n, engine="catalyst").collect()
        )
        assert a == c, f"n={n}"
        assert len({r[0] for r in a}) == 300  # every doc represented


def test_hashed_shingle_sets_parity(spark):
    """Arrow shingle-set kernel vs the Catalyst spec: same per-doc hash
    SETS (order differs by design: sorted vs first-occurrence)."""
    import random

    from grove_spark.operators.dedup_fuzzy import hashed_shingle_sets

    rows = []
    for i in range(300):
        rng = random.Random(i * 13)
        k = rng.randint(0, 10)
        rows.append((i, " ".join(f"w{rng.randint(0, 9)}" for _ in range(k))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc"]: frozenset(r["sh_set"])
         for r in hashed_shingle_sets(df, 3, engine="arrow").collect()}
    c = {r["doc"]: frozenset(r["sh_set"])
         for r in hashed_shingle_sets(df, 3, engine="catalyst").collect()}
    assert a == c
    assert len(a) == 300  # short docs kept with empty sets
