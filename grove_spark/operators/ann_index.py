"""Ingest-time ANN index layout (VERDICT r3 #5): make "the table is
clustered by bucket so a query touches |bucket| rows" REAL, end-to-end.

similarity.py computes the cluster keys (IVF cells from a trained coarse
quantizer, or hyperplane-LSH sign buckets); this module owns the
STORAGE contract around them:

* ``write_ann_index`` assigns the key at ingest and writes the table in
  one of two layouts:
  - ``partitioned``: hive ``cell=<v>/`` directories — a probe compiles
    to Catalyst PartitionFilters, so non-probed cells' files are never
    even LISTED. Right when the key cardinality is modest (IVF cells).
  - ``clustered``: flat files range-clustered + sorted by the key, so
    each file's footer min/max spans a tight key range — the probe
    prunes FILES through sources/file_stats.py (the same Iceberg-analog
    machinery the incremental scan uses). Right when the key space is
    large/skewed (2^n_planes LSH buckets) and hive dirs would mean a
    million tiny directories.
  Plus ``_ann_meta.json`` carrying the quantizer itself (centroids /
  planes seed), because an index you cannot re-derive the query-time
  probe function for is just a table.
* ``ann_index_scan`` reads back ONLY the probed cells' data (partition-
  or file-pruned; the residual predicate always applies on top).
* ``ann_query`` is the full query path: derive the probe set from the
  stored quantizer, pruned-scan, exact cosine re-rank inside.

At 100 TB the difference is structural: brute force reads N vectors per
query; the indexed path reads |probed cells| / |cells| of the table and
the pruning happens at PLAN time (no I/O on the rest).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import List, Optional

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grove_spark.operators.similarity import (
    _hyperplanes,
    add_lsh_bucket,
    brute_force_topk,
    ivf_assign,
)

_META = "_ann_meta.json"


def write_ann_index(
    emb: DataFrame,
    path: str,
    kind: str = "ivf",
    centroids: Optional[np.ndarray] = None,
    codebooks: Optional[np.ndarray] = None,
    keep_vectors: bool = False,
    n_planes: int = 8,
    seed: int = 7,
    layout: str = "partitioned",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_files: int = 32,
) -> dict:
    """Assign the cluster key and write the ANN-ready table + metadata.

    ``kind='ivf'`` needs trained ``centroids`` (ivf_train_centroids);
    ``kind='lsh'`` derives sign buckets from (n_planes, seed). See the
    module docstring for the two layouts."""
    if kind == "ivf":
        if centroids is None:
            raise ValueError("kind='ivf' needs trained centroids")
        assigned = ivf_assign(emb, centroids, vec_col, out="cell")
        cluster_col = "cell"
    elif kind == "ivf_pq":
        # IVF cells for plan-time pruning + PQ codes instead of vectors
        # inside them: the index stores m uint8s per vector (32× smaller
        # than 64-d float32), queried via LUT scoring (pq_adc_topk).
        # keep_vectors=True retains the raw vector column for exact
        # in-index re-rank; the 100-TB shape drops it and re-ranks
        # against the source table if exact order matters.
        if centroids is None:
            raise ValueError("kind='ivf_pq' needs trained centroids")
        if codebooks is None:
            raise ValueError("kind='ivf_pq' needs trained PQ codebooks")
        from grove_spark.operators.similarity import ivf_assign_pq_encode

        # codes are RESIDUALS vs the cell centroid (canonical IVF-PQ):
        # raw-vector codes spend their capacity on the global spread and
        # intra-cell order drowns in quantization error (recall@10 0.23
        # vs 1.0 measured on the 1M-vector leg). Assign + encode run as
        # ONE fused Arrow kernel (r6): the chained ivf_assign → pq_encode
        # form crossed the JVM↔Python boundary twice with the full
        # vector column; identical values, half the transfer.
        assigned = ivf_assign_pq_encode(
            emb, centroids, codebooks, vec_col,
            cell_out="cell", code_out="code",
        )
        if not keep_vectors:
            assigned = assigned.drop(vec_col)
        cluster_col = "cell"
    elif kind == "lsh":
        assigned = add_lsh_bucket(
            emb, vec_col, n_planes, seed, out="bucket"
        )
        cluster_col = "bucket"
    else:
        raise ValueError(f"unknown ANN index kind {kind!r}")

    if layout == "partitioned":
        (
            assigned.repartition(cluster_col)
            .write.mode("overwrite")
            .partitionBy(cluster_col)
            .parquet(path)
        )
    elif layout == "clustered":
        # range-cluster + sort: every flat file covers a tight key range,
        # so footer min/max (file_stats.py) prunes whole files at query
        # time without hive directory explosion
        (
            assigned.repartitionByRange(n_files, cluster_col)
            .sortWithinPartitions(cluster_col)
            .write.mode("overwrite")
            .parquet(path)
        )
    else:
        raise ValueError(f"unknown layout {layout!r}")

    meta = {
        "kind": kind,
        "layout": layout,
        "cluster_col": cluster_col,
        "vec_col": vec_col,
        "id_col": id_col,
        "n_planes": n_planes,
        "seed": seed,
        "centroids": centroids.tolist() if centroids is not None else None,
        "codebooks": codebooks.tolist() if codebooks is not None else None,
        "keep_vectors": keep_vectors,
    }
    fd, tmp = tempfile.mkstemp(dir=path, prefix="._w-")
    with os.fdopen(fd, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, _META))
    return meta


def read_ann_meta(path: str) -> dict:
    with open(os.path.join(path, _META)) as f:
        return json.load(f)


def ann_index_scan(
    spark: SparkSession, path: str, probe: List[int], meta: Optional[dict] = None
) -> DataFrame:
    """Read ONLY the probed cells: PartitionFilters for the partitioned
    layout, footer-stats file pruning (a file is kept iff its
    [min, max] key range contains a probed value) for the clustered
    one. The residual ``isin`` predicate applies either way — pruning
    changes cost, never results. ``df._grove_prune`` reports
    {files_kept, files_total}."""
    meta = meta or read_ann_meta(path)
    ccol = meta["cluster_col"]
    probe = sorted(int(c) for c in probe)
    if meta["layout"] == "partitioned":
        from grove_spark.sources.file_stats import _list_parquet

        # read ONLY the probed cell directories (basePath keeps the cell
        # partition column): the full-table read paid file listing and
        # partition discovery over EVERY cell dir per query before
        # Catalyst pruned them again — planning cost proportional to the
        # index, not the probe. The residual isin stays (pruning changes
        # cost, never results), and a probe of missing cells degrades to
        # the empty-but-typed frame.
        probe_dirs = [
            os.path.join(path, f"{ccol}={v}")
            for v in probe
            if os.path.isdir(os.path.join(path, f"{ccol}={v}"))
        ]
        if probe_dirs:
            df = spark.read.option("basePath", path).parquet(*probe_dirs)
        else:
            df = spark.read.parquet(path).where(F.lit(False))
        df = df.where(F.col(ccol).isin(probe))
        kept = sum(len(_list_parquet(d)) for d in probe_dirs)
        total = len(_list_parquet(path))
    else:
        from grove_spark.sources.file_stats import (
            _list_parquet,
            _to_comparable,
            parquet_file_stats,
        )

        files = _list_parquet(path)
        stats = parquet_file_stats(files, ccol)
        kept_files = []
        for fpath in files:
            ent = stats[fpath]
            lo, hi = ent.get("min"), ent.get("max")
            if lo is None or hi is None:
                kept_files.append(fpath)  # stat-less: keep conservatively
                continue
            lo_c = _to_comparable(lo, ent["kind"])
            hi_c = _to_comparable(hi, ent["kind"])
            if any(lo_c <= v <= hi_c for v in probe):
                kept_files.append(fpath)
        if kept_files:
            df = spark.read.option("basePath", path).parquet(*kept_files)
        else:
            df = spark.read.parquet(path).where(F.lit(False))
        df = df.where(F.col(ccol).isin(probe))
        kept, total = len(kept_files), len(files)
    df._grove_prune = {"files_kept": kept, "files_total": total}  # type: ignore[attr-defined]
    return df


def _probe_set(meta: dict, query_vec: List[float], n_probe: int,
               probe_hamming: int) -> List[int]:
    if meta["kind"] in ("ivf", "ivf_pq"):
        cents = np.asarray(meta["centroids"], dtype=np.float64)
        cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        q = np.asarray(query_vec, dtype=np.float64)
        q = q / np.linalg.norm(q)
        return [int(c) for c in np.argsort(-(cents @ q))[:n_probe]]
    planes = _hyperplanes(len(query_vec), meta["n_planes"], meta["seed"])
    qb = 0
    for j in range(meta["n_planes"]):
        if float(np.dot(query_vec, planes[j])) >= 0:
            qb |= 1 << j
    probe = [qb]
    if probe_hamming >= 1:
        probe += [qb ^ (1 << j) for j in range(meta["n_planes"])]
    if probe_hamming >= 2:
        probe += [
            qb ^ (1 << i) ^ (1 << j)
            for i in range(meta["n_planes"])
            for j in range(i + 1, meta["n_planes"])
        ]
    return probe


def ann_query(
    spark: SparkSession,
    path: str,
    query_vec: List[float],
    k: int = 10,
    n_probe: int = 4,
    probe_hamming: int = 1,
    refine: int = 4,
) -> DataFrame:
    """The end-to-end indexed ANN query: stored quantizer -> probe set
    -> pruned scan of probed cells only -> rank inside.

    ivf / lsh: exact cosine over the stored vectors.
    ivf_pq: LUT (asymmetric-distance) scoring over the m-byte codes —
    the probed cells' VECTORS are never read (with keep_vectors=False
    they do not even exist in the index). ``refine``·k ADC candidates
    are taken; with keep_vectors=True they are exactly re-ranked
    in-index (a bounded ``refine·k``-id lookup), otherwise the ADC
    order itself is returned with approximate sims."""
    meta = read_ann_meta(path)
    probe = _probe_set(meta, query_vec, n_probe, probe_hamming)
    sub = ann_index_scan(spark, path, probe, meta)
    if meta["kind"] == "ivf_pq":
        from grove_spark.operators.similarity import pq_adc_topk

        books = np.asarray(meta["codebooks"], dtype=np.float64)
        cents = np.asarray(meta["centroids"], dtype=np.float64)
        n_cand = max(k, refine * k)
        cands = pq_adc_topk(
            sub, books, query_vec, n_cand, meta["id_col"], "code",
            centroids=cents, cell_col=meta["cluster_col"],
        )
        if meta.get("keep_vectors"):
            ids = [r[0] for r in cands.select(meta["id_col"]).collect()]
            out = brute_force_topk(
                sub.where(F.col(meta["id_col"]).isin(ids)),
                query_vec, k, meta["id_col"], meta["vec_col"],
            )
        else:
            out = (
                cands.withColumnRenamed("sim_pq", "sim")
                .orderBy(F.desc("sim"), F.asc(meta["id_col"]))
                .limit(k)
            )
    else:
        out = brute_force_topk(
            sub, query_vec, k, meta["id_col"], meta["vec_col"]
        )
    out._grove_prune = sub._grove_prune  # type: ignore[attr-defined]
    return out
