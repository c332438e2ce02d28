"""Time EVERY registry case once (count-driven, bench-style) at a given
SF dir — the round-13 whole-bank timing census used to rank non-headline
operators for optimization attention. Single attempt per case: enough to
rank, not to publish (the bench's best-of-3 remains the published number).

Usage: python tools/time_registry.py [sf_dir] > /tmp/registry_times.jsonl
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    from youcruit_tap_rawpostgresql_spark.querybank import REGISTRY
    from youcruit_tap_rawpostgresql_spark.session import get_session

    spark = get_session(app_name="spark-graft-census", cpus=cpus)
    next(iter(REGISTRY.values())).fn(spark, sf_dir).count()
    for name, case in REGISTRY.items():
        t0 = time.perf_counter()
        try:
            n = case.fn(spark, sf_dir).count()
            err = None
        except Exception as e:  # noqa: BLE001
            n, err = -1, f"{type(e).__name__}: {e}"[:120]
        dt = round(time.perf_counter() - t0, 3)
        print(json.dumps({"name": name, "sec": dt, "rows": n, "err": err}), flush=True)
        print(f"  {name}: {dt}s", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
