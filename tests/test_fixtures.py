"""Fixture generator invariants (no Spark needed)."""

import numpy as np
import pyarrow.dataset as ds

from grove_spark.fixtures.generator import (
    SOURCE_NAMES,
    gen_sequences,
    gen_sinks_dim,
    gen_sources_dim,
    write_fixture,
)


def test_writer_matches_pandas_path_across_shards(tmp_path):
    """The chunked Arrow writer and the pandas path must produce
    identical rows for the same n_rows (incl. across the 25k shard
    boundary) — tests rely on gen_sequences as the oracle for data
    written by write_fixture."""
    p = write_fixture(str(tmp_path), 30000)
    tbl = ds.dataset(p["sequences"]).to_table().to_pandas()
    ref = gen_sequences(30000)
    assert len(tbl) == 30000
    for i in [0, 24999, 25000, 29999]:
        assert tbl.loc[i, "doc_id"] == ref.loc[i, "doc_id"]
        assert list(tbl.loc[i, "tokens"]) == list(ref.loc[i, "tokens"])
        assert tbl.loc[i, "raw"] == ref.loc[i, "raw"]
        assert tbl.loc[i, "source"] == ref.loc[i, "source"]


def test_deterministic_same_seed():
    a = gen_sequences(500)
    b = gen_sequences(500)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert all(list(x) == list(y) for x, y in zip(a["tokens"], b["tokens"]))


def test_source_distribution_is_skewed():
    df = gen_sequences(20000)
    counts = df["source"].value_counts()
    # zipf head: the hottest source carries a disproportionate share
    assert counts.iloc[0] / len(df) > 0.25
    assert counts.iloc[0] / counts.iloc[-1] > 20


def test_n_tok_bounds_and_consistency():
    df = gen_sequences(2000)
    assert (df["n_tok"] >= 1).all() and (df["n_tok"] <= 2048).all()
    assert all(len(t) == n for t, n in zip(df["tokens"], df["n_tok"]))
    assert all((np.asarray(t) >= 0).all() and (np.asarray(t) < 50257).all()
               for t in df["tokens"][:50])


def test_dims_cover_all_sources():
    sources = gen_sources_dim()
    sinks = gen_sinks_dim()
    assert set(sources["source"]) == set(SOURCE_NAMES)
    assert set(sinks["connector"]) == set(sources["connector"])
    # every connector has a raw 'logs' and a processed 'processed' route
    per_conn = sinks.groupby("connector")["descriptor"].apply(set)
    assert all({"logs", "processed"} <= s for s in per_conn)
