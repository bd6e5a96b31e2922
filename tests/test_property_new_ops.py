"""Property-based parity for the late-round operators: randomized inputs
through dedup_lines / mixture_sample / zorder_value must agree with
pure-Python oracles implementing the documented semantics directly."""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from grove_spark.operators.dedup import dedup_lines
from grove_spark.operators.layout import zorder_value
from grove_spark.operators.packing import _KNUTH, mixture_sample

SETTINGS = dict(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_line = st.sampled_from(["aa bb", "cc dd", "ee", "ff gg hh", "ii", "jj kk"])
_doc = st.lists(_line, min_size=1, max_size=5)


@given(docs=st.lists(_doc, min_size=1, max_size=8), min_count=st.integers(2, 3))
@settings(**SETTINGS)
def test_dedup_lines_matches_python_oracle(spark, docs, min_count):
    rows = [(i, "\n".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in dedup_lines(df, min_count=min_count).collect()}

    # oracle: a line is boilerplate when it appears in >= min_count
    # DISTINCT docs; keep='none' drops it from every doc, order kept
    df_count = Counter()
    for _i, d in enumerate(docs):
        for line in set(d):
            df_count[line] += 1
    for i, d in enumerate(docs):
        kept = [ln for ln in d if df_count[ln] < min_count]
        assert got[i].n_lines == len(d)
        assert got[i].n_kept == len(kept)
        assert got[i].text_kept == "\n".join(kept)


@given(
    n=st.integers(10, 60),
    w_a=st.floats(0.5, 4.0),
    w_b=st.floats(0.0, 2.0),
    budget=st.integers(50, 3000),
)
@settings(**SETTINGS)
def test_mixture_sample_matches_python_oracle(spark, n, w_a, w_b, budget):
    rows = [(i, "a" if i % 2 == 0 else "b", 5 + i % 7) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")
    weights = {"a": w_a, **({"b": w_b} if w_b > 0 else {})}
    got = sorted(
        (r.doc_id, r.epoch)
        for r in mixture_sample(df, weights, budget).collect()
    )

    m = 10_000
    wsum = sum(weights.values())
    avail = Counter()
    for _i, s, t in rows:
        avail[s] += t
    want = []
    for i, s, t in rows:
        w = weights.get(s, 0.0)
        rate = (w / wsum) * float(budget) / float(avail[s])
        copies = int(rate // 1)
        thr = int((rate - copies) * m // 1)
        h = ((i % m) * (_KNUTH % m)) % m
        for e in range(copies):
            want.append((i, e))
        if h < thr:
            want.append((i, copies))
    assert got == sorted(want)


@given(
    xy=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1, max_size=8,
    )
)
@settings(**SETTINGS)
def test_zorder_value_matches_python_interleave(spark, xy):
    df = spark.createDataFrame(xy, "x int, y int")
    got = [
        r.z for r in
        df.select(zorder_value(["x", "y"], bits=8).alias("z")).collect()
    ]

    def interleave(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == [interleave(x, y) for x, y in xy]
