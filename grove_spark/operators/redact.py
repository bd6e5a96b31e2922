"""PII / sensitive-text redaction for training-data pipelines.

A standard pre-training text stage: emails, phone numbers, SSNs, IPs
and key-like tokens are replaced with typed mask tokens before the text
ships. Implemented as a compiled chain of Catalyst ``regexp_replace``
expressions — pure JVM, whole-stage-codegen, zero Python — with
per-rule hit counters riding ``df.observe()`` exactly like the routing
`_saved` telemetry (operators/routing.py sink_counts; the reference's
per-operation metrics, grove/connectors/__init__.py:144-148).

Rule patterns stay inside the regex subset Java and RE2 share (no
backreferences, no lookaround) so the same rule set is testable against
a DuckDB oracle and portable to other engines.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied IN ORDER; order matters when
# patterns could overlap (email first so user@host never half-matches a
# later rule's token pattern).
DEFAULT_RULES: List[Tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # provider-style secret tokens: prefixed, long, high-entropy-shaped
    ("api_key", r"\b(?:sk|pk|key|tok|ghp|xox[bp])[-_][A-Za-z0-9_-]{16,}\b", "<KEY>"),
]


def redaction_expr(text: Column, rules: Optional[List[Tuple[str, str, str]]] = None) -> Column:
    """The pure column expression: rules applied sequentially."""
    out = text
    for _, pattern, repl in rules or DEFAULT_RULES:
        out = F.regexp_replace(out, pattern, repl)
    return out


def redact(
    df: DataFrame,
    text_col: str = "text",
    rules: Optional[List[Tuple[str, str, str]]] = None,
    out_col: Optional[str] = None,
    with_counts: bool = True,
):
    """Redact ``text_col`` in place (or into ``out_col``).

    Returns ``(df, observation)``: after the first action on the result,
    ``observation.get`` yields ``{"<rule>_hits": total_matches}`` per
    rule — counted on the text state each rule actually saw (i.e. after
    the earlier rules' replacements), so the counters sum exactly what
    was masked. ``observation`` is None when ``with_counts=False``.
    """
    rules = rules or DEFAULT_RULES
    out_col = out_col or text_col
    cur = F.col(text_col)
    obs = None
    if not with_counts:
        for _, pattern, repl in rules:
            cur = F.regexp_replace(cur, pattern, repl)
        return df.withColumn(out_col, cur), obs
    # Counters semantics: each rule counts on the text state it actually
    # saw (after earlier rules' replacements). Naively that makes metric
    # i re-run the first i replacements inside the observe aggregate —
    # O(rules²) regex passes per row, and the final output column runs
    # the whole chain once more. Projecting each intermediate count AND
    # the final text as columns FIRST puts every regexp in ONE
    # projection, where codegen's subexpression elimination shares the
    # progressive replace chain — one replace + one count per rule per
    # row. The observe then just sums ints. Same expressions, same
    # order, byte-identical counters and output.
    tmp_cols = []
    base = df
    for name, pattern, repl in rules:
        cname = f"__redact_{name}"
        base = base.withColumn(cname, F.regexp_count(cur, F.lit(pattern)))
        tmp_cols.append(cname)
        cur = F.regexp_replace(cur, pattern, repl)
    # the redacted text joins the SAME projection, so the full chain is
    # evaluated exactly once per row and shared with the counts
    base = base.withColumn("__redact_out", cur)
    tmp_cols.append("__redact_out")
    obs = Observation("redact")
    base = base.observe(
        obs,
        *[
            F.sum(F.col(f"__redact_{name}")).alias(f"{name}_hits")
            for name, _, _ in rules
        ],
    )
    out = base.withColumn(out_col, F.col("__redact_out")).drop(*tmp_cols)
    return out, obs
