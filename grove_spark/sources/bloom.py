"""Per-directory key bloom sidecars — point-membership pruning for
stores that are NOT clustered by the probe key.

Footer min/max pruning (sources/file_stats.py) is range pruning: it
only bites when the key is (roughly) sorted across files. A store
partitioned by TIME probed by DOC ID — the right-to-be-forgotten
delete, the correction merge, the decontamination lookup — has every
dir's id range spanning the whole domain, so range pruning keeps
everything. A bloom answers the question ranges can't: "can this dir
contain ANY of these keys?" with no false negatives and a chosen
false-positive rate; dirs that answer no are never read, never
rewritten.

Layout: one sidecar file ``_key_bloom_<col>.bin`` INSIDE the run dir
(underscore prefix: invisible to Spark's file index and to
``_list_parquet``), so it travels with the dir through commit /
compaction-replace / retention untouched. Format: magic, m (bits),
k (hashes), then the little-endian uint64 bit words.

Hashing: the classic double-hash scheme bit_i = (h1 + i*h2) mod m with
h1 = xxhash64(key) and h2 = xxhash64(SEED, key) — both computed BY
CATALYST on build and probe alike, so the Python side never needs to
reimplement the hash for any key type (int, string, ...) and the two
sides cannot drift. The build is one narrow column scan aggregated to
one bloom per partition in a numpy Arrow kernel (no per-row Python),
OR-merged on the driver: ~m/8 bytes per partition crossing the wire,
independent of row count.

Sizing uses the parquet-footer row total as n (an upper bound over
distinct keys — a bloom sized for more keys than it holds only gets
MORE accurate).

Choosing ``fpr``: the dir-level question is "any of K probe keys in
this dir?", whose false-positive rate is 1-(1-fpr)^K ≈ K·fpr — a batch
of 1,000 keys against a 1% bloom false-hits almost every dir. Size for
the probe batch you expect: fpr 1e-6 (≈3.6 bytes/key) keeps a 1,000-key
batch's dir-level false-rewrite odds at ~0.1%. merge_into's automatic
rebuilds default to 1e-6 for this reason.
"""

from __future__ import annotations

import math
import os
import struct
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

_MAGIC = b"GSBF1"
_H2_SEED = 0xB10F  # second hash: xxhash64(lit(_H2_SEED), key)


def _bloom_params(n_keys: int, fpr: float) -> Tuple[int, int]:
    """(m bits rounded up to a multiple of 64, k hashes) for n keys at
    the target false-positive rate."""
    n = max(1, n_keys)
    m = max(64, int(math.ceil(-n * math.log(fpr) / (math.log(2) ** 2))))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2)))
    return m, int(k)


def _set_bits(bits: np.ndarray, h1: np.ndarray, h2: np.ndarray, m: int, k: int) -> None:
    m_ = np.uint64(m)
    one = np.uint64(1)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % m_
        np.bitwise_or.at(bits, (idx >> np.uint64(6)).astype(np.int64),
                         one << (idx & np.uint64(63)))


def _test_bits(bits: np.ndarray, h1: np.ndarray, h2: np.ndarray, m: int, k: int) -> np.ndarray:
    """Boolean array: key i has ALL k bits set."""
    m_ = np.uint64(m)
    one = np.uint64(1)
    hit = np.ones(len(h1), dtype=bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % m_
        word = bits[(idx >> np.uint64(6)).astype(np.int64)]
        hit &= (word & (one << (idx & np.uint64(63)))) != 0
    return hit


def _hash_cols(key_col: str):
    from pyspark.sql import functions as F

    return (
        F.xxhash64(F.col(key_col)).cast("long").alias("__h1"),
        F.xxhash64(F.lit(_H2_SEED), F.col(key_col)).cast("long").alias("__h2"),
    )


def bloom_sidecar_path(dir_path: str, key_col: str) -> str:
    return os.path.join(dir_path, f"_key_bloom_{key_col}.bin")


def build_key_bloom(
    spark,
    dir_path: str,
    key_col: str,
    fpr: float = 0.01,
) -> dict:
    """Build and write the bloom sidecar for one run dir. Returns
    {m, k, n, bytes}. One narrow scan of the key column; one ~m/8-byte
    bloom per partition crosses to the driver."""
    import pandas as pd

    from grove_spark.sources.file_stats import _list_parquet, parquet_file_stats

    files = _list_parquet(dir_path)
    n = sum(
        e.get("rows") or 0
        for e in parquet_file_stats(files, key_col).values()
    )
    m, k = _bloom_params(n, fpr)

    hashes = spark.read.parquet(dir_path).select(*_hash_cols(key_col))

    def acc(batches: Iterable["pd.DataFrame"]):
        bits = np.zeros(m // 64, dtype=np.uint64)
        for pdf in batches:
            h1 = pdf["__h1"].to_numpy().view(np.uint64)
            h2 = pdf["__h2"].to_numpy().view(np.uint64)
            _set_bits(bits, h1, h2, m, k)
        yield pd.DataFrame({"bloom": [bits.tobytes()]})

    parts = hashes.mapInPandas(acc, "bloom binary").collect()
    bits = np.zeros(m // 64, dtype=np.uint64)
    for r in parts:
        bits |= np.frombuffer(r["bloom"], dtype=np.uint64)

    payload = _MAGIC + struct.pack("<QI", m, k) + bits.tobytes()
    path = bloom_sidecar_path(dir_path, key_col)
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
    return {"m": m, "k": k, "n": n, "bytes": len(payload)}


def load_bloom(dir_path: str, key_col: str) -> Optional[Tuple[np.ndarray, int, int]]:
    """(bits, m, k) from the sidecar, or None when absent/unreadable —
    a missing or corrupt bloom degrades to 'keep the dir', never to a
    wrong answer."""
    path = bloom_sidecar_path(dir_path, key_col)
    try:
        with open(path, "rb") as f:
            payload = f.read()
    except OSError:
        return None
    if not payload.startswith(_MAGIC):
        return None
    try:
        m, k = struct.unpack_from("<QI", payload, len(_MAGIC))
        bits = np.frombuffer(payload, dtype=np.uint64,
                             offset=len(_MAGIC) + 12)
    except (struct.error, ValueError):
        return None
    if len(bits) * 64 != m or k < 1:
        return None
    return bits, int(m), int(k)


def probe_dirs(
    dirs: List[str],
    key_col: str,
    h1: np.ndarray,
    h2: np.ndarray,
) -> Dict[str, bool]:
    """{dir: can it contain ANY of the hashed keys}. Dirs without a
    sidecar map to True (conservative). h1/h2 must come from the SAME
    Catalyst expressions the build used (_hash_cols).

    Driver-serial: cost is O(dirs × sidecar bytes) of local reads —
    right up to a few thousand dirs. Past that, use
    ``probe_dirs_distributed``."""
    out: Dict[str, bool] = {}
    h1 = np.asarray(h1, dtype=np.int64).view(np.uint64)
    h2 = np.asarray(h2, dtype=np.int64).view(np.uint64)
    for d in dirs:
        doc = load_bloom(d, key_col)
        if doc is None:
            out[d] = True
            continue
        bits, m, k = doc
        out[d] = bool(_test_bits(bits, h1, h2, m, k).any()) if len(h1) else False
    return out


def probe_dirs_distributed(
    spark,
    dirs: List[str],
    key_col: str,
    h1: np.ndarray,
    h2: np.ndarray,
) -> Dict[str, bool]:
    """Same answer as ``probe_dirs``, computed EXECUTOR-side: the dirs
    list is parallelized and each task reads its dirs' sidecars from
    shared storage, testing against the broadcast key hashes. This is
    the 100k-dir path — the driver never opens a sidecar, it only
    collects one boolean per dir. Requires executors to see the store
    filesystem (the same assumption every scan in this engine makes)."""
    import pandas as pd

    sc = spark.sparkContext
    bh = sc.broadcast((
        np.asarray(h1, dtype=np.int64).view(np.uint64).tobytes(),
        np.asarray(h2, dtype=np.int64).view(np.uint64).tobytes(),
        key_col,
    ))
    n_slices = max(1, min(len(dirs), sc.defaultParallelism * 4))
    dirs_df = spark.createDataFrame(
        [(d,) for d in dirs], "dir string"
    ).repartition(n_slices)

    def probe(batches):
        hb1, hb2, col = bh.value
        ph1 = np.frombuffer(hb1, dtype=np.uint64)
        ph2 = np.frombuffer(hb2, dtype=np.uint64)
        for pdf in batches:
            hits = []
            for d in pdf["dir"]:
                doc = load_bloom(d, col)
                if doc is None:
                    hits.append(True)  # conservative: keep the dir
                    continue
                bits, m, k = doc
                hits.append(
                    bool(_test_bits(bits, ph1, ph2, m, k).any())
                    if len(ph1) else False
                )
            yield pd.DataFrame({"dir": pdf["dir"], "hit": hits})

    rows = dirs_df.mapInPandas(probe, "dir string, hit boolean").collect()
    try:
        bh.unpersist()
    except Exception:  # pragma: no cover - broadcast cleanup best-effort
        pass
    return {r["dir"]: bool(r["hit"]) for r in rows}
