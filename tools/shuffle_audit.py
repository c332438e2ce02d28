"""Measured shuffle inventory: run headline queries and report the actual
shuffle write / input / spill bytes each one moved (REST status API on an
audit-only session with the UI enabled). This turns SCALE.md's shuffle
claims ("one exchange", "map-only") into measured numbers.

Usage: python tools/shuffle_audit.py [query ...]   # default: headline set
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _totals(ui: str, app_id: str) -> dict[str, int]:
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
    )
    out = {"shuffle_write": 0, "input": 0, "spill": 0, "stages": 0}
    for s in stages:
        if s.get("status") not in ("COMPLETE", "ACTIVE"):
            continue
        out["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        out["input"] += s.get("inputBytes", 0)
        out["spill"] += s.get("diskBytesSpilled", 0)
        out["stages"] += 1
    return out


def main() -> None:
    from pyspark.sql import SparkSession

    from youcruit_tap_rawpostgresql_spark.querybank import REGISTRY

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spark-graft-shuffle-audit")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]

    names = sys.argv[1:] or [n for n, c in REGISTRY.items() if c.headline]
    results: dict[str, dict[str, int | float]] = {}
    for name in names:
        case = REGISTRY[name]
        before = _totals(ui, app_id)
        n_rows = case.fn(spark, SF_DIR).count()
        after = _totals(ui, app_id)
        results[name] = {
            "rows_out": n_rows,
            "shuffle_write_kb": round(
                (after["shuffle_write"] - before["shuffle_write"]) / 1024, 1
            ),
            "input_mb": round((after["input"] - before["input"]) / 2**20, 2),
            "spill_kb": round((after["spill"] - before["spill"]) / 1024, 1),
            "stages": after["stages"] - before["stages"],
        }
        print(f"  {name}: {results[name]}", file=sys.stderr)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
