"""Generate QUERIES.md — a flat catalog of every registered query case:
name, one-line summary (from the docstring), oracle status, bench flag,
and implementing module. Run after adding cases:

    python tools/gen_catalog.py > QUERIES.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from youcruit_tap_rawpostgresql_spark.querybank import REGISTRY

    print("# QUERIES — the full case catalog (auto-generated)")
    print()
    print(f"{len(REGISTRY)} cases; every one is a `queries()` entry the driver")
    print("runs against its DuckDB oracle at sf0.01 (rows-only where marked).")
    print("Regenerate with `python tools/gen_catalog.py > QUERIES.md`.")
    print()
    print("| case | summary | oracle | bench | module |")
    print("|---|---|---|---|---|")
    for name, case in sorted(REGISTRY.items()):
        doc = (case.fn.__doc__ or "").strip()
        first = doc.split("\n\n")[0].replace("\n", " ")
        first = " ".join(first.split())
        if len(first) > 160:
            first = first[:157] + "..."
        first = first.replace("|", "\\|")
        oracle = "hash" if case.oracle else "rows-only"
        bench = "headline" if case.headline else ""
        module = case.fn.__module__.rsplit(".", 1)[-1]
        print(f"| `{name}` | {first} | {oracle} | {bench} | {module} |")


if __name__ == "__main__":
    main()
