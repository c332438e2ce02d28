"""Spark-side timing census: run EVERY registry case (no oracle) at one
SF and report the slowest, to surface operators whose plans degenerate
at scales the driver's sf0.01 gate never exercises.

Round-5 provenance: this instrument found dedup_ngram_jaccard at 381 s
(sf0.1) — four stacked causes, all invisible at sf0.01 — and then the
same single-split-serialization class in four more operators. Run it
after adding operators or changing fixtures.

Usage: python tools/census.py [sf_dir] [top_n]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from youcruit_tap_rawpostgresql_spark.querybank import REGISTRY
    from youcruit_tap_rawpostgresql_spark.session import get_session

    spark = get_session(app_name="spark-graft-census", cpus=os.cpu_count() or 4)
    rows: list[tuple[float, str]] = []
    errors: list[str] = []
    for name, case in REGISTRY.items():
        t0 = time.perf_counter()
        try:
            case.fn(spark, sf_dir).count()
            el = time.perf_counter() - t0
            rows.append((el, name))
            print(f"{el:8.2f}  {name}", file=sys.stderr, flush=True)
        except Exception as e:
            errors.append(f"{name}: {type(e).__name__} {str(e)[:140]}")
            print(f"   ERR   {name}", file=sys.stderr, flush=True)
    rows.sort(reverse=True)
    print(f"== census {sf_dir}: {len(rows)} ok, {len(errors)} errors ==")
    for el, name in rows[:top_n]:
        print(f"{el:8.2f}  {name}")
    for e in errors:
        print(f"ERR {e}")


if __name__ == "__main__":
    main()
