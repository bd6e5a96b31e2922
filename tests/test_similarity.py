"""ANN: brute-force is the exact baseline; LSH and the batch-matmul
kernel must agree with it (LSH: high recall; matmul: exact)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from grove_spark.operators.similarity import (
    add_lsh_bucket,
    brute_force_topk,
    lsh_topk,
    topk_batch_matmul,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(emb):
    return list(emb.where(F.col("vec_id") == 0).first()["embedding"])


def test_brute_force_self_is_top1(spark, emb, qvec):
    top = brute_force_topk(emb, qvec, k=5).collect()
    assert top[0]["vec_id"] == 0
    assert top[0]["sim"] == pytest.approx(1.0, abs=1e-6)
    assert all(top[i]["sim"] >= top[i + 1]["sim"] for i in range(len(top) - 1))


def test_lsh_topk_recall_planted(spark):
    """LSH preserves *actual* proximity: plant 10 perturbations of the
    query among 200 random vectors; multi-probe LSH must recover most.
    (On uniformly random data nearest 'neighbors' are ~orthogonal and no
    LSH family helps — that's the expected property, not a bug.)"""
    import pyspark.sql.types as T

    rng = np.random.default_rng(3)
    q = rng.standard_normal(32)
    rows = [(i, [float(x) for x in rng.standard_normal(32)]) for i in range(200)]
    rows += [(200 + i, [float(x) for x in q + rng.standard_normal(32) * 0.15]) for i in range(10)]
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    df = spark.createDataFrame(rows, schema=schema)
    qvec = [float(x) for x in q]
    exact = {r["vec_id"] for r in brute_force_topk(df, qvec, k=10).collect()}
    assert exact == set(range(200, 210))  # the planted ones
    with_buckets = add_lsh_bucket(df, n_planes=6, dim=32)
    approx = {r["vec_id"] for r in lsh_topk(with_buckets, qvec, k=10, n_planes=6).collect()}
    recall = len(exact & approx) / 10
    assert recall >= 0.7


def test_batch_matmul_matches_bruteforce(spark, emb, qvec):
    exact = [(r["vec_id"], r["sim"]) for r in brute_force_topk(emb, qvec, k=10).collect()]
    got = (
        topk_batch_matmul(emb, np.array([qvec]), k=10)
        .orderBy(F.desc("sim"))
        .collect()
    )
    assert [r["vec_id"] for r in got] == [v for v, _ in exact]
    for (ve, se), r in zip(exact, got):
        assert r["sim"] == pytest.approx(se, rel=1e-9)


def test_bucket_deterministic(spark, emb):
    b1 = {r["vec_id"]: r["bucket"] for r in add_lsh_bucket(emb, n_planes=5).select("vec_id", "bucket").collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in add_lsh_bucket(emb, n_planes=5).select("vec_id", "bucket").collect()}
    assert b1 == b2
    assert 1 < len(set(b1.values())) <= 32


def test_ivf_recall_planted(spark):
    """IVF with planted neighbors: the true top-10 live near the query,
    so its cell (+probes) recovers them; recall >= 0.8."""
    import pyspark.sql.types as T

    from grove_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        ivf_train_centroids,
    )

    rng = np.random.default_rng(5)
    q = rng.standard_normal(32)
    rows = [(i, [float(x) for x in rng.standard_normal(32)]) for i in range(300)]
    rows += [(300 + i, [float(x) for x in q + rng.standard_normal(32) * 0.12]) for i in range(10)]
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    df = spark.createDataFrame(rows, schema=schema)
    qvec = [float(x) for x in q]

    cents = ivf_train_centroids(df, n_centroids=8, sample=310, seed=3)
    assigned = ivf_assign(df, cents)
    # every vector got a cell; cells are non-degenerate
    cells = assigned.groupBy("cell").count().collect()
    assert sum(r["count"] for r in cells) == 310
    assert len(cells) >= 4

    exact = {r["vec_id"] for r in brute_force_topk(df, qvec, k=10).collect()}
    assert exact == set(range(300, 310))
    approx = {r["vec_id"] for r in ivf_topk(assigned, cents, qvec, k=10, n_probe=3).collect()}
    assert len(exact & approx) / 10 >= 0.8
