"""Text normalization for dedup / quality pipelines.

The standard pre-dedup canonicalization (CCNet-style): lowercase, fold
accented Latin characters, strip punctuation, collapse whitespace.
Everything is a Catalyst expression chain (lower / translate /
regexp_replace) — whole-stage-codegen'd, no Python in the hot path, and
cheap enough to inline ahead of MinHash/SimHash signatures so that
near-dup detection is insensitive to casing/punctuation noise.

Accent folding is an explicit translate table rather than an ICU
dependency: deterministic, engine-portable (the DuckDB oracle uses the
same table), and covers the Latin-1 range that dominates web text. Text
outside the table (CJK, Cyrillic) passes through untouched, which is the
right behavior for a dedup canonicalizer — it must be stable, not
linguistically complete.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# lowercase-only tables: normalize_text_expr lowercases first
ACCENT_SRC = "àáâãäåèéêëìíîïòóôõöùúûüçñýÿ"
ACCENT_DST = "aaaaaaeeeeiiiiooooouuuucnyy"

assert len(ACCENT_SRC) == len(ACCENT_DST)


def normalize_text_expr(
    col,
    lowercase: bool = True,
    fold_accents: bool = True,
    strip_punct: bool = True,
    collapse_ws: bool = True,
) -> Column:
    """Canonicalize a text column for dedup/fingerprinting.

    Order matters and is fixed: lower -> fold accents -> punctuation to
    space -> collapse runs of whitespace and trim. ``\\p{L}\\p{N}`` keeps
    letters/digits in every script (Java regex here, RE2 in the DuckDB
    oracle — both support the unicode classes)."""
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    if fold_accents:
        c = F.translate(c, ACCENT_SRC, ACCENT_DST)
    if strip_punct:
        c = F.regexp_replace(c, r"[^\p{L}\p{N}\s]", " ")
    if collapse_ws:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c
