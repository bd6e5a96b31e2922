"""The vectorized parse stage: grok/regex field extraction from raw log
lines (the Spark analog of a Grove connector's response parsing).

Two interchangeable engines, tested for equality:

* ``catalyst`` — ``regexp_extract`` column expressions: JVM-side,
  whole-stage-codegen'd, the fast default.
* ``arrow`` — a pandas UDF doing the same extraction with one vectorized
  ``Series.str.extract`` per Arrow batch (per BASELINE's north_star:
  connectors become "vectorized parse stages expressed as pandas/Arrow
  UDFs"). No per-row Python either way.

Custom grok patterns compile to either engine; named groups become
struct fields.
"""

from __future__ import annotations

import re
from typing import Dict

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The fixture's synthetic log line (fixtures/generator.py):
#   "<iso-ts> level=<LEVEL> source=<src> doc=<doc_id> n=<n>"
DEFAULT_PATTERN = (
    r"^(?P<ts>\S+) level=(?P<level>\w+) source=(?P<src>[\w-]+) "
    r"doc=(?P<doc>[\w-]+) n=(?P<n>\d+)$"
)

# grok-ish shorthand -> regex, for config-supplied patterns
_GROK = {
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?Z?",
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "INT": r"\d+",
    "IP": r"\d{1,3}(?:\.\d{1,3}){3}",
    "GREEDYDATA": r".*",
}


def grok_to_regex(pattern: str) -> str:
    """Expand ``%{NAME:field}`` grok references into named regex groups."""

    def sub(m: re.Match) -> str:
        kind, name = m.group(1), m.group(2)
        return f"(?P<{name}>{_GROK[kind]})"

    return re.sub(r"%\{(\w+):(\w+)\}", sub, pattern)


def _group_names(pattern: str) -> list[str]:
    return list(re.compile(pattern).groupindex.keys())


def parse_catalyst(raw: Column, pattern: str = DEFAULT_PATTERN) -> Column:
    """Compile the named-group regex to one regexp_extract per field.

    Catalyst caches the compiled Pattern per task; N extracts over the
    same line stay in one codegen stage.
    """
    # regexp_extract addresses groups by NUMBER; groupindex carries each
    # named group's true number, which stays correct even when the
    # pattern mixes in unnamed capturing groups (order-of-appearance
    # numbering silently extracted the wrong fields for those).
    groupindex = re.compile(pattern).groupindex
    plain = re.sub(r"\(\?P<\w+>", "(", pattern)
    fields = [
        F.regexp_extract(raw, plain, num).alias(name)
        for name, num in groupindex.items()
    ]
    return F.struct(*fields)


def parse_arrow(raw: Column, pattern: str = DEFAULT_PATTERN) -> Column:
    """Same extraction as an Arrow-vectorized pandas UDF (one
    ``Series.str.extract`` per batch — no per-row Python)."""
    names = _group_names(pattern)
    out_t = T.StructType([T.StructField(n, T.StringType()) for n in names])

    @F.pandas_udf(out_t)
    def extract(s: pd.Series) -> pd.DataFrame:
        # select the NAMED columns: str.extract also emits positional
        # columns for unnamed capturing groups, which the struct lacks
        df = s.str.extract(pattern)[names]
        return df.fillna("")  # regexp_extract yields '' on miss; keep parity

    return extract(raw)


def parse_stage(
    df: DataFrame,
    raw_col: str = "raw",
    pattern: str = DEFAULT_PATTERN,
    engine: str = "catalyst",
    out_col: str = "parsed",
) -> DataFrame:
    if "%{" in pattern:
        pattern = grok_to_regex(pattern)
    fn = parse_catalyst if engine == "catalyst" else parse_arrow
    return df.withColumn(out_col, fn(F.col(raw_col), pattern))


def parse_stage_multi(
    df: DataFrame,
    patterns: dict,
    key_col: str = "source",
    raw_col: str = "raw",
    out_col: str = "parsed",
) -> DataFrame:
    """Per-connector grok patterns in ONE plan: each source's lines parse
    with its own pattern (the reference's per-connector response parsing,
    one class each; here one CASE over compiled extracts). The output
    struct is the UNION of every pattern's named groups — fields a
    pattern lacks are null for its rows, so heterogeneous vendor formats
    land in one typed column. Stays entirely inside codegen (a chain of
    ``when`` over regexp_extract structs; grok shorthand expands first).
    """
    compiled = {
        k: grok_to_regex(p) if "%{" in p else p for k, p in patterns.items()
    }
    all_fields: list[str] = []
    for p in compiled.values():
        for n in _group_names(p):
            if n not in all_fields:
                all_fields.append(n)

    def struct_for(p: str) -> Column:
        # groupindex gives the true group number per name (unnamed
        # capturing groups shift positional numbering — see parse_catalyst)
        groupindex = re.compile(p).groupindex
        plain = re.sub(r"\(\?P<\w+>", "(", p)
        cols = []
        for n in all_fields:
            if n in groupindex:
                cols.append(
                    F.regexp_extract(F.col(raw_col), plain, groupindex[n]).alias(n)
                )
            else:
                cols.append(F.lit(None).cast("string").alias(n))
        return F.struct(*cols)

    expr = None
    for k, p in compiled.items():
        branch = F.when(F.col(key_col) == k, struct_for(p))
        expr = branch if expr is None else expr.when(F.col(key_col) == k, struct_for(p))
    null_struct = F.lit(None).cast(
        T.StructType([T.StructField(n, T.StringType()) for n in all_fields])
    )
    expr = expr.otherwise(null_struct) if expr is not None else null_struct
    return df.withColumn(out_col, expr)
