"""Round-13 measurement harness (guide §1): per-headliner timing split.

For every bench headliner, separately time
  - build: the ``case.fn(spark, sf_dir)`` call — driver-side Python,
    Catalyst analysis, and any jobs the fn runs internally (collects,
    exports, iteration loops);
  - exec:  materializing every column of the returned frame through the
    noop sink (guide §1.4) — the computation itself, no sink cost.

Jobs are labelled (guide §1.5) and the session writes an event log so
stage-level attribution is greppable afterwards.

Usage: python tools/profile_bench.py [N_REPEATS] [--filter substr]
Writes JSON lines to stdout; stderr carries progress.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    repeats = 3
    name_filter = None
    args = sys.argv[1:]
    if "--filter" in args:
        i = args.index("--filter")
        name_filter = args[i + 1]
        del args[i : i + 2]
    if args:
        repeats = int(args[0])

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    from youcruit_tap_rawpostgresql_spark.querybank import REGISTRY
    from youcruit_tap_rawpostgresql_spark.session import get_session

    os.makedirs("/tmp/spark-events", exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_EVENTLOG", "1")
    spark = get_session(app_name="spark-graft-profile", cpus=cpus)

    headline = {n: c for n, c in REGISTRY.items() if c.headline}
    if name_filter:
        headline = {n: c for n, c in headline.items() if name_filter in n}

    # same warmup as bench.py
    next(iter(REGISTRY.values())).fn(spark, sf_dir).count()
    from youcruit_tap_rawpostgresql_spark.functions.vectors import cosine_pairs

    v = spark.range(256).selectExpr("array(cast(id as float), 1.0F) AS a")
    v.select(cosine_pairs("a", "a")).count()
    v.mapInPandas(lambda it: it, v.schema).count()

    for name, case in headline.items():
        rows = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"{name}#r{i}:build")
            t0 = time.perf_counter()
            df = case.fn(spark, sf_dir)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{name}#r{i}:exec")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            rows.append((round(t1 - t0, 3), round(t2 - t1, 3)))
        spark.sparkContext.setJobDescription(None)
        best_total = min(b + e for b, e in rows)
        out = {
            "name": name,
            "build": [r[0] for r in rows],
            "exec": [r[1] for r in rows],
            "best_total": round(best_total, 3),
        }
        print(json.dumps(out), flush=True)
        print(f"  {name}: {out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
