"""Pure-Python built-in equivalents of the reference's shipped workloads.

The reference ships word count (bash: tr/awk/uniq — reference:
tests/testdata/exec/wc_map.sh, wc_reduce.sh) and distributed grep
(Python — reference: tests/testdata/exec/grep_map.py, grep_reduce.py).
These callables reproduce their exact line-level semantics without
shelling out, so jobs run identically on hosts without bash/coreutils and
so the DuckDB oracle has a closed-form equivalent.

Mapper protocol: ``fn(line) -> iterable[(key, value)]``.
Reducer protocol: ``fn(key, values) -> iterable[str]`` (output lines,
no trailing newline), invoked per key group in sorted key order.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator


def wc_map(line: str) -> Iterator[tuple[str, str]]:
    """Word-count mapper: split on space/tab, lowercase, emit (token, "1").

    Matches ``tr '[ \\t]' '\\n' | tr upper lower | awk '{print $1"\\t1"}'``
    including the subtle cases: a blank input line becomes the empty token
    (the golden output counts "" nine times), and awk's ``$1`` of an
    empty line is "" so multiple separators yield empty tokens too.
    """
    for token in line.lower().replace("\t", " ").split(" "):
        yield (token, "1")


def wc_reduce(key: str, values: Iterable[str]) -> Iterator[str]:
    """Word-count reducer: count occurrences of the (already grouped) key.

    Matches ``cut -f1 | uniq -c | awk '{print $2"\\t"$1}'`` on sorted
    input — the value is assumed to always be "1", so counting items is
    identical to summing values.
    """
    yield f"{key}\t{sum(1 for _ in values)}"


def make_grep_map(query: str = "product"):
    """Grep mapper factory. The reference hard-codes the default query
    ("product") because the framework passes no argv to executables
    (reference: tests/testdata/exec/grep_map.py:14-17).
    Emits ("1", line) for case-insensitive substring matches.
    """

    def grep_map(line: str) -> Iterator[tuple[str, str]]:
        if query in line.lower():
            yield ("1", line)

    return grep_map


def grep_reduce(key: str, values: Iterable[str]) -> Iterator[str]:
    """Grep reducer: print the matching lines (values), drop the key.

    The reference's reducer also defensively skips malformed records
    (reference: tests/testdata/exec/grep_reduce.py:19-30); our values are
    structurally well-formed by construction.
    """
    for value in values:
        if value:
            yield value
