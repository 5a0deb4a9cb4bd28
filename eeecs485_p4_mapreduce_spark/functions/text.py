"""Text-analysis column expressions, engine-portable by construction.

Everything here is built from deterministic integer / string primitives
(md5-derived 32-bit hashes, integer counts, exact int/int divisions) so the
same math can be stated in ANSI SQL for the DuckDB oracle — and so results
are bit-stable across partitionings, which matters when these run as part
of a 100 TB dedup pass (a fingerprint must not depend on row order).

All expressions are Catalyst `Column`s using built-in / higher-order
functions — no Python UDFs; the hot path stays in the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokenization shared by all text operators: split on single spaces
# (the synthetic corpus is space-separated; for raw text swap the pattern).
TOKEN_PATTERN = "[ \t]"

# Minimal stopword lists for the language-ID heuristic.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "a", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "dans", "un", "une"),
    "es": ("el", "los", "las", "y", "es", "en", "un", "una"),
}


def tokens(text_col: str = "text") -> Column:
    return F.split(F.lower(F.col(text_col)), TOKEN_PATTERN)


def hash32(col_expr: str) -> str:
    """SQL fragment: deterministic 32-bit hash of a string expression via
    md5 — portable to any engine with md5 + hex parsing (DuckDB oracle:
    CAST('0x' || substr(md5(x),1,8) AS UBIGINT))."""
    return f"cast(conv(substring(md5({col_expr}), 1, 8), 16, 10) as bigint)"


def count_in_list(arr: str, words: tuple[str, ...]) -> str:
    """SQL fragment: number of elements of array `arr` that are in `words`
    (occurrence count, not distinct)."""
    quoted = ", ".join(f"'{w}'" for w in words)
    return f"size(filter({arr}, t -> t in ({quoted})))"


def word_shingles(arr: str, k: int = 3) -> str:
    """SQL fragment: distinct k-word shingles of token-array expression
    `arr` (pass the tokenizer expression itself, not a pre-projected
    column name).

    `arr` is evaluated exactly once per row via a lambda let-binding —
    ``transform(array(arr), __t -> ...)[0]``. Without it, Catalyst's
    CollapseProject inlines the tokenizer into every `element_at`
    reference inside the shingle lambda, re-running the regex split
    O(k x n_shingles) times per row (measured 31x slower at sf0.1).

    Guarded for short docs: Spark's sequence(1, n) with n < 1 would count
    DOWN (descending sequence), so the when() guard is load-bearing.
    """
    joined = ", ' ', ".join(f"element_at(__t, i + {j})" for j in range(k))
    return (
        f"transform(array({arr}), __t -> "
        f"array_distinct(CASE WHEN size(__t) >= {k} THEN "
        f"transform(sequence(1, size(__t) - {k - 1}), i -> concat({joined})) "
        f"ELSE array() END))[0]"
    )
