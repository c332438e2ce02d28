"""Diff two bench.py JSON outputs and report per-query deltas.

Usage: python tools/bench_compare.py old.json new.json [threshold_pct]

Prints queries whose wall-clock moved more than threshold_pct (default 30%)
in either direction, plus totals — the quick regression check between
rounds (BENCH_r{N}.json files) or before/after an optimization. Exits 0
always: local[] timings are noisy, so this is a report, not a gate.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(1)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0

    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(f"total: {old.get('value')}s -> {new.get('value')}s")
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None:
            print(f"  + {name}: {b}s (new)")
        elif b is None:
            print(f"  - {name}: was {a}s (removed)")
        else:
            pct = (b - a) / a * 100 if a else 0.0
            if abs(pct) >= thresh:
                arrow = "SLOWER" if pct > 0 else "faster"
                print(f"  {name}: {a}s -> {b}s ({pct:+.0f}% {arrow})")


if __name__ == "__main__":
    main()
