"""Scaling-curve evidence: run a representative headline subset at
sf0.001 / sf0.01 / sf0.1 and report wall time per SF plus the 0.01→0.1
ratio (data grows 10×; a scan-bound operator should grow ≲10×, a
fixed-overhead-dominated one ~1×). Results are recorded in SCALE.md.

Usage: python tools/scaling.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
DEFAULT = (
    "q1_pricing_summary",
    "q3_top_orders",
    "q21_sole_late_supplier",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "text_tfidf_topk",
    "sessionize",
    "kmeans_embed_lloyd",
    "graph_pagerank_trade",
)


def main() -> None:
    names = sys.argv[1:] or list(DEFAULT)
    from youcruit_tap_rawpostgresql_spark.querybank import REGISTRY
    from youcruit_tap_rawpostgresql_spark.session import get_session

    spark = get_session(app_name="spark-graft-scaling", cpus=os.cpu_count() or 4)
    # warm the JVM once so sf0.001 timings aren't all classload
    REGISTRY[names[0]].fn(spark, SFS[0]).count()

    out: dict[str, dict[str, float]] = {}
    for name in names:
        case = REGISTRY[name]
        row: dict[str, float] = {}
        for sf_dir in SFS:
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                case.fn(spark, sf_dir).count()
                el = time.perf_counter() - t0
                best = el if best is None or el < best else best
            sf = sf_dir.rsplit("sf", 1)[-1]
            row[sf] = round(best, 3)
        row["x_01_to_1"] = round(row["0.1"] / row["0.01"], 2) if row["0.01"] else 0.0
        out[name] = row
        print(f"  {name}: {row}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
