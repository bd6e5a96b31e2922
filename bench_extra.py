"""Stage-level isolation benchmarks (guide §1.4): time each expensive
operator's internal stages with noop sinks / counts so optimization work
targets the real cost, not a guess. NOT the driver contract — bench.py
stays the judged harness; numbers here are cited in OPTIMIZATION_r06.md.

Usage: python bench_extra.py <leg> [...legs]
Legs: dedup_stages, ann_stages, decon_stages, redact_stages,
      compute_stages, merge_stages, stream_stages, queries
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("GROVE_SPARK_DRIVER_MEM", "6g")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

import bench  # reuse the frozen harness's fixture builders


def _spark():
    return bench.build_session(CPUS)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn, n=1):
    walls = []
    for _ in range(n):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        out = fn()
        walls.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    print(f"  {label}: {min(walls)} s {walls if n > 1 else ''} -> {out}",
          flush=True)
    return min(walls)


def dedup_stages(spark):
    """Break the 1M-doc minhash leg into stages."""
    from pyspark.sql import functions as F

    from grove_spark.operators.dedup_fuzzy import (
        hashed_shingle_sets,
        lsh_candidate_pairs,
        minhash_dedup_pairs,
        minhash_signatures,
    )

    sf = bench.infer_sf(SF_DIR)
    n_scale = max(int(10_000_000 * sf), 20_000)
    boiler_every = max(20, n_scale // 2000 // 20 * 20)
    path = bench.docs_fixture(
        f"dedupscale-sf{sf}-be{boiler_every}", n_scale, boiler_every=boiler_every
    )
    docs = (
        spark.read.parquet(path)
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )
    n = docs.count()
    print(f"dedup_stages: {n} docs", flush=True)
    # warm
    minhash_dedup_pairs(docs.limit(20_000), threshold=0.7).count()

    timed(spark, "sig-noop", lambda: noop(minhash_signatures(docs)), n=2)
    sigs = minhash_signatures(docs).persist()
    sigs.count()
    # banding projection alone (the capped path's input stream)
    cap = min(1000, max(n // boiler_every // 2, 8))
    timed(spark, "cands-from-cached-sigs",
          lambda: lsh_candidate_pairs(sigs, 16, 4, max_bucket_size=cap).count(),
          n=2)
    sigs.unpersist()
    tele = {}
    t0 = time.perf_counter()
    pairs = minhash_dedup_pairs(
        docs, threshold=0.7, telemetry=tele, max_bucket_size=cap
    ).persist()
    npairs = pairs.count()
    print(f"  full minhash_dedup_pairs: {round(time.perf_counter()-t0,3)} s"
          f" pairs={npairs} tele={tele}", flush=True)
    pairs.unpersist()
    # verify-only: candidates cached, how long is the verify tail?
    from grove_spark.operators.dedup_fuzzy import lsh_candidate_pairs as lcp
    sigs = minhash_signatures(docs).persist()
    cands = lcp(sigs, 16, 4, max_bucket_size=cap).localCheckpoint(eager=True)
    sigs.unpersist()

    def verify():
        cand_docs = (
            cands.select(F.col("a").alias("doc"))
            .union(cands.select(F.col("b").alias("doc")))
            .distinct()
        )
        ids = F.broadcast(cand_docs.withColumnRenamed("doc", "doc_id"))
        cand_rows = docs.join(ids, "doc_id", "left_semi")
        sets = hashed_shingle_sets(cand_rows, 3).localCheckpoint(eager=True)
        j = cands.join(
            sets.select(F.col("doc").alias("a"), F.col("sh_set").alias("sh_a")), "a"
        ).join(sets.select(F.col("doc").alias("b"), F.col("sh_set").alias("sh_b")), "b")
        common = F.size(F.array_intersect("sh_a", "sh_b"))
        jac = common / (F.size("sh_a") + F.size("sh_b") - common)
        return j.where(jac >= F.lit(0.7)).select("a", "b").count()

    timed(spark, "verify-tail", verify, n=2)
    docs.unpersist()


def ann_stages(spark):
    import numpy as np

    from grove_spark.operators.ann_index import ann_query, write_ann_index
    from grove_spark.operators.similarity import (
        brute_force_topk,
        ivf_assign,
        ivf_train_centroids,
        pq_encode,
        pq_train,
    )

    sf = bench.infer_sf(SF_DIR)
    n_ann = max(int(10_000_000 * sf), 50_000)
    path = bench.ann_fixture(f"annscale-sf{sf}", n_ann)
    emb = (
        spark.read.parquet(path)
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )
    n = emb.count()
    print(f"ann_stages: {n} vectors", flush=True)
    cents = ivf_train_centroids(emb, n_centroids=256, sample=4096)
    timed(spark, "ivf_assign-noop", lambda: noop(ivf_assign(emb, cents)), n=2)
    idx = os.path.join(bench.CACHE_ROOT, "_extra_ivf")
    import shutil
    shutil.rmtree(idx, ignore_errors=True)
    timed(spark, "ivf-index-build",
          lambda: write_ann_index(emb, idx, kind="ivf", centroids=cents,
                                  layout="partitioned") and None)
    books = pq_train(emb, m=16, ksub=256, sample=4096, centroids=cents)
    timed(spark, "pq_encode-noop",
          lambda: noop(pq_encode(ivf_assign(emb, cents), books,
                                 centroids=cents)), n=2)
    pqx = os.path.join(bench.CACHE_ROOT, "_extra_pq")
    shutil.rmtree(pqx, ignore_errors=True)
    timed(spark, "pq-index-build",
          lambda: write_ann_index(emb, pqx, kind="ivf_pq", centroids=cents,
                                  codebooks=books, keep_vectors=True,
                                  layout="partitioned") and None)
    rng = np.random.RandomState(71)
    fcents = np.random.RandomState(23).randn(1024, 64).astype(np.float32)
    qs = []
    for qi in range(4):
        c = int(rng.randint(0, 1024))
        qs.append((fcents[c] + 0.15 * rng.randn(64).astype(np.float32)).tolist())
    timed(spark, "ivf-query",
          lambda: [ann_query(spark, idx, q, k=10, n_probe=8).collect() and None
                   for q in qs] and None, n=2)
    timed(spark, "pq-query",
          lambda: [ann_query(spark, pqx, q, k=10, n_probe=8, refine=64).collect()
                   and None for q in qs] and None, n=2)
    timed(spark, "bruteforce-query",
          lambda: [brute_force_topk(spark.read.parquet(path), q, 10).collect()
                   and None for q in qs] and None, n=2)
    emb.unpersist()


def decon_stages(spark):
    from pyspark.sql import functions as F

    from grove_spark.operators.decontaminate import decontaminate
    from grove_spark.operators.dedup_fuzzy import word_shingles

    sf = bench.infer_sf(SF_DIR)
    n_scale = max(int(10_000_000 * sf), 20_000)
    boiler_every = max(20, n_scale // 2000 // 20 * 20)
    path = bench.docs_fixture(
        f"dedupscale-sf{sf}-be{boiler_every}", n_scale, boiler_every=boiler_every
    )
    docs = (
        spark.read.parquet(path)
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )
    n = docs.count()
    benchmark = docs.where(F.col("doc_id") % 200 == 7).select("text")
    print(f"decon_stages: {n} docs", flush=True)
    decontaminate(docs.limit(20_000), benchmark).count()  # warm
    # explode cost alone: string shingles vs hashed-before-explode
    timed(spark, "explode-strings-then-hash",
          lambda: noop(word_shingles(docs.select("doc_id", "text"), "text", 13)
                       .select(F.col("doc_id"),
                               F.xxhash64("shingle").alias("g"))), n=2)
    from grove_spark.operators.dedup_fuzzy import _distinct_grams
    timed(spark, "hash-then-explode",
          lambda: noop(docs.select(
              F.col("doc_id"),
              F.explode(F.transform(_distinct_grams("text", 13),
                                    lambda g: F.xxhash64(g))).alias("g"))),
          n=2)
    timed(spark, "decon-broadcast",
          lambda: decontaminate(docs, benchmark).count(), n=2)
    timed(spark, "decon-shuffle",
          lambda: decontaminate(docs, benchmark,
                                broadcast_benchmark=False).count(), n=2)
    docs.unpersist()


def redact_stages(spark):
    from pyspark.sql import functions as F

    from grove_spark.operators.redact import redact

    sf = bench.infer_sf(SF_DIR)
    n_scale = max(int(10_000_000 * sf), 20_000)
    boiler_every = max(20, n_scale // 2000 // 20 * 20)
    path = bench.docs_fixture(
        f"dedupscale-sf{sf}-be{boiler_every}", n_scale, boiler_every=boiler_every
    )
    docs = (
        spark.read.parquet(path)
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )
    docs.count()
    pii = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 3,
            F.concat(F.col("text"), F.lit(" bob@example.com 123-45-6789")),
        ).otherwise(F.col("text")),
    )

    def run(with_counts):
        red, obs = redact(pii, with_counts=with_counts)
        red.agg(F.sum(F.octet_length("text"))).first()
        return obs.get if obs else None

    timed(spark, "redact-with-counts", lambda: run(True) and None, n=2)
    timed(spark, "redact-no-counts", lambda: run(False), n=2)
    docs.unpersist()


def compute_stages(spark):
    from pyspark.sql import functions as F

    from grove_spark.operators.dedup import dedup_by_hash
    from grove_spark.operators.enrich import enrich
    from grove_spark.operators.routing import route
    from grove_spark.plans.metadata import grove_metadata
    from grove_spark.plans.parse import parse_stage

    sf = bench.infer_sf(SF_DIR)
    paths = bench.fixture(f"scaling-sf{sf}", int(bench.SCALING_ROWS_PER_SF * sf))
    seq, sources, sinks = bench.load(spark, paths)
    seen = bench._seen_state(spark)
    # warm
    bench.compute_run(spark, paths, CPUS)
    timed(spark, "scan-only", lambda: noop(seq), n=2)
    timed(spark, "scan+dedup_by_hash",
          lambda: noop(dedup_by_hash(seq, seen, ["doc_id", "tokens"],
                                     "event_time")), n=2)
    df1 = dedup_by_hash(seq, seen, ["doc_id", "tokens"], "event_time")
    df2 = parse_stage(df1, "raw") if "raw" in seq.columns else df1
    timed(spark, "+parse", lambda: noop(df2), n=2)
    df3 = enrich(df2, sources, on="source")
    timed(spark, "+enrich", lambda: noop(df3), n=2)
    df4 = grove_metadata(df3, pointer=F.col("event_time").cast("string"),
                         collection_time="2026-01-01T00:00:00Z")
    df5 = route(df4, sinks, connector_col="connector", raw_col="tokens")
    timed(spark, "+meta+route(full cols)", lambda: noop(df5), n=2)
    timed(spark, "full-build_pipeline",
          lambda: bench.compute_run(spark, paths, CPUS), n=3)


def merge_stages(spark):
    sf = bench.infer_sf(SF_DIR)
    n_scale = max(int(10_000_000 * sf), 20_000)
    t0 = time.perf_counter()
    out = bench.merge_scale_run(spark, n_scale)
    print(f"  merge_scale_run total {round(time.perf_counter()-t0,3)} s: "
          f"{json.dumps(out)}", flush=True)


def stream_stages(spark):
    sf = bench.infer_sf(SF_DIR)
    n_scale = max(int(10_000_000 * sf), 20_000)
    t0 = time.perf_counter()
    out = bench.stream_scale_run(spark, n_scale)
    print(f"  stream_scale_run total {round(time.perf_counter()-t0,3)} s: "
          f"{json.dumps(out)}", flush=True)


def queries(spark):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in bench.HEADLINE:
        fn = qs[name]
        fn(spark, SF_DIR).count()  # warm
        timed(spark, f"q:{name}", lambda: fn(spark, SF_DIR).count(), n=2)


LEGS = {
    "dedup_stages": dedup_stages,
    "ann_stages": ann_stages,
    "decon_stages": decon_stages,
    "redact_stages": redact_stages,
    "compute_stages": compute_stages,
    "merge_stages": merge_stages,
    "stream_stages": stream_stages,
    "queries": queries,
}


def main():
    legs = sys.argv[1:] or list(LEGS)
    spark = _spark()
    for leg in legs:
        print(f"== {leg} ==", flush=True)
        t0 = time.perf_counter()
        LEGS[leg](spark)
        print(f"== {leg} done in {round(time.perf_counter()-t0,1)} s ==",
              flush=True)
    spark.stop()




def sig_parts(spark):
    """Decompose the signature projection: grams+string-hash vs the
    64-seed min walk."""
    from pyspark.sql import functions as F

    from grove_spark.operators.dedup_fuzzy import _distinct_grams

    sf = bench.infer_sf(SF_DIR)
    n_scale = max(int(10_000_000 * sf), 20_000)
    boiler_every = max(20, n_scale // 2000 // 20 * 20)
    path = bench.docs_fixture(
        f"dedupscale-sf{sf}-be{boiler_every}", n_scale, boiler_every=boiler_every
    )
    docs = (
        spark.read.parquet(path)
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )
    docs.count()
    hs = docs.select(
        "doc_id",
        F.transform(_distinct_grams("text", 3), lambda g: F.xxhash64(g)).alias("__hs"),
    ).where(F.size("__hs") > 0)
    timed(spark, "hs-only-noop", lambda: noop(hs), n=2)
    docs.unpersist()


LEGS["sig_parts"] = sig_parts


if __name__ == "__main__":
    main()
