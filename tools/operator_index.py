#!/usr/bin/env python3
"""Generate OPERATORS.md: every registered query with its source location,
first docstring line, and oracle status — the engine's surface as one
checkable table.

Usage: python tools/operator_index.py > OPERATORS.md
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from eeecs485_p4_mapreduce_spark.registry import ORACLES, QUERIES, load_all

    load_all()
    rows = []
    for name, fn in QUERIES.items():
        src = inspect.getsourcefile(fn) or "?"
        src = os.path.relpath(src, "/root/repo")
        try:
            line = inspect.getsourcelines(fn)[1]
        except OSError:
            line = 0
        doc = (inspect.getdoc(fn) or "").split("\n")[0].rstrip(".") or "—"
        oracle = "sql-hash" if name in ORACLES else "rows-only"
        rows.append((name, f"{src}:{line}", oracle, doc))

    print("# OPERATORS — the registered query surface")
    print()
    print(f"{len(rows)} queries; `sql-hash` = DuckDB oracle hash-compared by")
    print("the driver gate, `rows-only` = genuinely non-SQL-expressible")
    print("(exactness pinned by pytest instead). Regenerate with")
    print("`python tools/operator_index.py > OPERATORS.md`. A — in the")
    print("last column means the rationale lives in the section comment")
    print("directly above the function (see source link) instead of a")
    print("docstring.")
    print()
    print("| query | source | oracle | what it does |")
    print("|---|---|---|---|")
    for name, loc, oracle, doc in sorted(rows):
        doc = doc.replace("|", "\\|")
        print(f"| {name} | {loc} | {oracle} | {doc} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
