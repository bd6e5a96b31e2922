"""The processor library: Grove's five record-level processors as
config-driven ``DataFrame -> DataFrame`` transforms.

Reference semantics (all cited to /root/reference):

* extract_paths  — grove/processors/extract_paths.py:46-97
* filter_entries — grove/processors/filter_entries.py:20-47
* filter_paths   — grove/processors/filter_paths.py:20-44
* split_path     — grove/processors/split_path.py:45-81
* zip_paths      — grove/processors/zip_paths.py:41-113
* chain runner   — grove/connectors/__init__.py:756-790 (flatMap splice
  semantics: a processor may drop, map, or fan out each row)

Everything compiles to Catalyst expressions at plan-build time; the hot
path has no Python at all. Processors in the reference run row-at-a-time
with per-entry JMESPath interpretation; here a chain of N processors is a
single whole-stage-codegen'd projection (filters and column pruning push
down through it to the scan).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from grove_spark.functions.paths import (
    assemble_nested,
    drop_nested_field,
    first_truthy,
    path_col,
    quote_aware_split,
    resolve_type,
)


@dataclass
class Mapping:
    """One extract_paths field mapping (extract_paths.py:22-43).

    Exactly one of ``sources`` / ``static`` should be set — sources are
    tried in order, first truthy value wins; static writes a literal.
    """

    destination: str
    sources: List[str] = field(default_factory=list)
    static: Optional[str] = None

    def __post_init__(self) -> None:
        if self.static is not None and self.sources:
            raise ValueError("Either sources or static should be set, not both.")


def extract_paths(
    df: DataFrame,
    fields: Sequence[Mapping | dict],
    raw: Optional[str] = None,
) -> DataFrame:
    """Project + rename + schema-map: build a brand-new row from mappings.

    Mirrors extract_paths.py:59-97: the output contains ONLY the mapped
    destinations (unmapped input columns are dropped); ``raw`` embeds the
    whole original row as a compact JSON string; dotted destinations
    build nested structs; a mapping whose sources all miss yields null.
    """
    mappings = [m if isinstance(m, Mapping) else Mapping(**m) for m in fields]
    schema = df.schema
    values: Dict[str, Column] = {}
    if raw:
        # compact JSON of the original entry incl. nulls, matching
        # json.dumps(entry, separators=(",", ":")) at extract_paths.py:69-74
        values[raw] = F.to_json(
            F.struct(*[F.col(c) for c in df.columns]),
            {"ignoreNullFields": "false"},
        )
    for m in mappings:
        if m.static is not None:
            values[m.destination] = F.lit(m.static)
        else:
            # sources whose path doesn't resolve in this schema compile
            # to null literals (JMESPath search returns None) — they stay
            # IN the chain so the last-source fallthrough matches the
            # reference when every source is falsy. compile_expr gives
            # sources the full expression surface (slices, length(),
            # contains(), multiselect-hash), not just bare paths.
            from grove_spark.functions.paths import compile_expr

            resolved = [
                compile_expr(schema, s) or (F.lit(None), None)
                for s in m.sources
            ]
            values[m.destination] = first_truthy(resolved)
    return df.select(*assemble_nested(values))


def filter_drop_condition(schema, filters: Sequence[str]):
    """The boolean drop condition of one ``filter_entries`` step: TRUE
    when ANY filter matches. Exposed so a fleet of filter-only chains
    can apply the chain as one post-routing predicate instead of a
    separate plan branch (config.assemble_fleet, r6) — identical
    semantics, the expression is the same one ``filter_entries`` uses."""
    from grove_spark.functions.paths import compile_expr, compile_predicate, truthy

    drop = F.lit(False)
    for f in filters:
        if f.startswith("sql:"):
            cond = F.expr(f[4:])
        else:
            cond = compile_predicate(schema, f)
            if cond is None:
                # bare expression: truthiness (covers contains(tags,'x'))
                sub = compile_expr(schema, f)
                cond = truthy(*sub) if sub is not None else F.lit(False)
        drop = drop | F.coalesce(cond, F.lit(False))
    return drop


def filter_entries(df: DataFrame, filters: Sequence[str]) -> DataFrame:
    """Drop a row when ANY filter matches (filter_entries.py:35-47).

    Each filter is one of:
    * a JMESPath-style comparison ``path <op> literal`` (the reference's
      query filters, filter_entries.py:44) — compiled to one Catalyst
      predicate;
    * a dotted path — dropped when the value is *truthy* (Python rules);
    * an arbitrary SQL boolean expression prefixed ``sql:`` — the
      typed-world escape hatch.
    """
    return df.filter(~filter_drop_condition(df.schema, filters))


def filter_paths(df: DataFrame, paths: Sequence[str]) -> DataFrame:
    """Delete each listed (possibly nested) field (filter_paths.py:20-44)."""
    for p in paths:
        df = drop_nested_field(df, p)
    return df


def split_path(df: DataFrame, source: str) -> DataFrame:
    """Fan out one row into N rows, one per element of the list at
    ``source`` (split_path.py:45-81). The element replaces the list.

    Passthrough rule: a null/empty list keeps the row (the reference
    returns the entry unmodified; in the typed result the source column
    becomes element-typed, so passthrough rows carry null there).
    """
    parts = quote_aware_split(source)
    src = path_col(source, df.schema)
    dtype = resolve_type(df.schema, source)
    if not isinstance(dtype, T.ArrayType):
        return df  # non-list: passthrough (split_path.py:68-69)
    elem_t = dtype.elementType
    exploded = F.explode(
        F.when(F.size(src) >= 1, src).otherwise(
            F.array(F.lit(None).cast(elem_t))
        )
    ).alias("__grove_split")
    df = df.select("*", exploded)
    df = _replace_at_path(df, parts, F.col("__grove_split"))
    return df.drop("__grove_split")


def zip_paths(
    df: DataFrame,
    source: str,
    key: str,
    values: Sequence[str],
) -> DataFrame:
    """K/V list -> map (zip_paths.py:62-113).

    The list of structs at ``source`` becomes ``map<key, value>`` where
    value is the first non-null of ``values`` (relative paths); children
    missing the key or all values are skipped; a missing source is a
    passthrough; last duplicate key wins (dict assignment order in the
    reference).
    """
    parts = quote_aware_split(source)
    src = path_col(source, df.schema)
    dtype = resolve_type(df.schema, source)
    if dtype is None:
        return df
    if not isinstance(dtype, T.ArrayType):
        src = F.array(src)  # scalar candidate wrapped (zip_paths.py:78-81)
        dtype = T.ArrayType(dtype)

    def rel(x: Column, p: str) -> Column:
        col = x
        for seg in quote_aware_split(p):
            col = col.getField(seg)
        return col

    entries = F.transform(
        src,
        lambda x: F.struct(
            rel(x, key).cast("string").alias("key"),
            F.coalesce(*[rel(x, v).cast("string") for v in values]).alias("value"),
        ),
    )
    kept = F.filter(entries, lambda e: e["key"].isNotNull() & e["value"].isNotNull())
    # last-wins duplicate-key semantics ride the session's
    # spark.sql.mapKeyDedupPolicy=LAST_WIN (session.py) — matching the
    # reference's dict assignment order without a quadratic dedup pass
    zipped = F.when(src.isNotNull(), F.map_from_entries(kept))
    df = df.withColumn("__grove_zip", zipped)
    df = _replace_at_path(df, parts, F.col("__grove_zip"))
    return df.drop("__grove_zip")


def _replace_at_path(df: DataFrame, parts: List[str], value: Column) -> DataFrame:
    """Replace the field at ``parts`` with ``value`` (update_path with
    replace=True, grove/helpers/parsing.py:76-140)."""
    root = parts[0]
    if len(parts) == 1:
        return df.withColumn(root, value)
    return df.withColumn(
        root,
        F.col(root).withField(".".join(f"`{p}`" for p in parts[1:]), value),
    )


# ---------------------------------------------------------------------------
# Chain runner — the processor pipeline (grove/connectors/__init__.py:756-790)
# ---------------------------------------------------------------------------

def decode_base64(df: DataFrame, paths: Sequence[str]) -> DataFrame:
    """P6: base64-decode config-flagged string fields in place
    (grove/models.py:22-42,193-201 applies ``decode(value, "base64")``
    to fields listed under ``encoding: {base64: [...]}``)."""
    for p in paths:
        parts = quote_aware_split(p)
        col = F.unbase64(path_col(p, df.schema)).cast("string")
        df = _replace_at_path(df, parts, col)
    return df


_PROCESSORS = {
    "extract_paths": lambda df, cfg: extract_paths(
        df, cfg.get("fields", []), raw=cfg.get("raw")
    ),
    "filter_entries": lambda df, cfg: filter_entries(df, cfg["filters"]),
    "filter_paths": lambda df, cfg: filter_paths(df, cfg["paths"]),
    "split_path": lambda df, cfg: split_path(df, cfg["source"]),
    "zip_paths": lambda df, cfg: zip_paths(
        df, cfg["source"], cfg["key"], cfg.get("values", [])
    ),
    "decode_base64": lambda df, cfg: decode_base64(df, cfg["paths"]),
}


def _redact_processor(df: DataFrame, cfg: Dict[str, Any]) -> DataFrame:
    """PII redaction as a config-chain processor: ``{"processor":
    "redact", "source": "text", "rules": [[name, pattern, mask], ...],
    "destination": "clean"}`` — rules default to operators/redact
    DEFAULT_RULES; counters live on the operator API, not the chain."""
    from grove_spark.operators.redact import redact

    rules = [tuple(r) for r in cfg.get("rules", [])] or None
    out, _ = redact(
        df,
        cfg.get("source", "text"),
        rules=rules,
        out_col=cfg.get("destination"),
        with_counts=False,
    )
    return out


_PROCESSORS["redact"] = _redact_processor

# identity of the BUILT-IN filter_entries entry: the fleet's
# predicate-compile fast path (config._filter_only_drop) must not fire
# when a plugin re-registered the name with different semantics
_BUILTIN_FILTER_ENTRIES = _PROCESSORS["filter_entries"]


def register_processor(name: str, fn) -> None:
    """Extension point — the Spark analog of Grove's setuptools
    entry-point processor plugins (grove/helpers/plugin.py:12-50)."""
    _PROCESSORS[name] = fn


def apply_chain(df: DataFrame, chain: Sequence[Dict[str, Any]]) -> DataFrame:
    """Run a Grove-style processor config chain over a DataFrame.

    Each element: ``{"processor": <name>, ...config}``. Unlike the
    reference's list-splice loop, the whole chain composes into ONE
    Catalyst plan; raw-vs-processed dual streams are just two plans over
    a shared (optionally persisted) scan — no quick_copy needed
    (grove/helpers/parsing.py:37-48 is obsolete under immutability).
    """
    for cfg in chain:
        cfg = dict(cfg)
        name = cfg.pop("processor")
        try:
            fn = _PROCESSORS[name]
        except KeyError:
            raise ValueError(f"unknown processor {name!r}") from None
        df = fn(df, cfg)
    return df
