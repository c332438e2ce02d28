"""Generate PLANS.md: the formatted physical plan of every bench
headliner at sf0.01, so plan quality is reviewable as text (pushed
filters, broadcast vs sort-merge joins, partial aggregation,
WindowGroupLimit, exchange reuse) without re-running anything.

Usage: python tools/gen_plans.py > PLANS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    from youcruit_tap_rawpostgresql_spark.querybank import REGISTRY
    from youcruit_tap_rawpostgresql_spark.session import get_session

    spark = get_session(app_name="spark-graft-plans", cpus=8)
    # non-adaptive plans: AQE hides ReusedExchange and final join
    # strategies until runtime; the static plan is the reviewable one
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    print("# PLANS — formatted physical plans of the bench headliners")
    print()
    print(f"Auto-generated (`python tools/gen_plans.py > PLANS.md`) at {SF_DIR},")
    print("non-adaptive so exchange reuse and join strategies are visible")
    print("statically. Things to look for per plan: `PushedFilters` on scans,")
    print("`BroadcastHashJoin` for dim joins, `partial_` aggregate modes,")
    print("`WindowGroupLimit` bounding top-k exchanges, `ReusedExchange` for")
    print("shared subtrees, and the ABSENCE of `CartesianProduct`.")
    for name, case in REGISTRY.items():
        if not case.headline:
            continue
        try:
            df = case.fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # cases that materialize internally
            plan = f"(plan unavailable: {type(e).__name__}: {e})"
        print()
        print(f"## {name}")
        print()
        print("```")
        print(plan.rstrip())
        print("```")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


if __name__ == "__main__":
    main()
