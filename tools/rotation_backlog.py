"""List registry cases that have never had a driver-grade CORRECTNESS row.

The round driver adjudicates the first 50 registry entries each round
(`CORRECTNESS_r{N}.json`); ROTATION.md rotates 40 never-checked cases into
that window per round. This tool recomputes the remaining backlog from the
actual CORRECTNESS files, so the pre-plan never drifts from the record.

Usage: python tools/rotation_backlog.py [--include-current-window]

By default the ACTIVE window's 50 names are treated as about-to-be-checked
(excluded from the backlog), matching how ROTATION.md counts.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    union: set[str] = set()
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        d = json.load(open(f))
        union.update(k for k, v in d.items() if isinstance(v, dict))

    from youcruit_tap_rawpostgresql_spark.querybank import REGISTRY

    names = list(REGISTRY)
    window = set(names[:50])
    backlog = [n for n in names if n not in union]
    if "--include-current-window" not in sys.argv:
        backlog = [n for n in backlog if n not in window]
    print(f"# registry={len(names)} driver-checked-union={len(union)} "
          f"active-window-first-timers={len(window - union)} "
          f"backlog={len(backlog)}")
    for n in backlog:
        print(n)


if __name__ == "__main__":
    main()
