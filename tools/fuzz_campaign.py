"""Extended differential fuzz campaign over the PG dialect layer.

The pytest modules (`tests/test_dialect_sqlsmith.py`) pin a FIXED corpus
(seeds 0..N per grammar) so CI stays fast and deterministic. This tool
drives the same generators over much larger seed ranges offline — the
long-tail hunt a real sqlsmith run does. Any failure reproduces in the
test file by adding its index to the parametrize range.

Usage:
    python tools/fuzz_campaign.py [--v1 1000] [--v2 1000] [--v3 600]
                                  [--v4 400] [--v5 600] [--v6 600]
                                  [--v7 600] [--v8 600] [--v9 600]
                                  [--v10 600] [--v11 600]

Each case is executed as-written by DuckDB (PG null-order pragma) and
as-translated by Spark, value-compared order-insensitively (v4 compares
Spark-vs-Spark: quantified form vs expanded OR/AND form). Prints one
line per failure with the grammar, index, and SQL; exits nonzero if any
case fails.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from tests.test_dialect_differential import (  # noqa: E402
    SF_DIR,
    _pg_faithful_duck,
    assert_differential,
)
from tests.test_dialect_sqlsmith import (  # noqa: E402
    N_CASES,
    N_CASES_V2,
    N_CASES_V3,
    N_CASES_V4,
    N_CASES_V5,
    N_CASES_V6,
    N_CASES_V7,
    N_CASES_V8,
    N_CASES_V9,
    N_CASES_V10,
    N_CASES_V11,
    N_CASES_V12,
    N_CASES_V13,
    N_CASES_V14,
    N_CASES_V15,
    N_CASES_V16,
    N_CASES_V17,
    N_CASES_V18,
    N_CASES_V19,
    gen_query,
    gen_query_v2,
    gen_query_v3,
    gen_query_v4,
    gen_query_v5,
    gen_query_v6,
    gen_query_v7,
    gen_query_v8,
    gen_query_v9,
    gen_query_v10,
    gen_query_v11,
    gen_query_v12,
    gen_query_v13,
    gen_query_v14,
    gen_query_v15,
    gen_query_v16,
    gen_query_v17,
    gen_query_v18,
    gen_query_v19,
)
from youcruit_tap_rawpostgresql_spark.plans.dialect import (  # noqa: E402
    translate_pg_sql,
)
from youcruit_tap_rawpostgresql_spark.querybank.registry import (  # noqa: E402
    tables,
)
from youcruit_tap_rawpostgresql_spark.session import get_session  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--v1", type=int, default=1000)
    ap.add_argument("--v2", type=int, default=1000)
    ap.add_argument("--v3", type=int, default=600)
    ap.add_argument("--v4", type=int, default=400)
    ap.add_argument("--v5", type=int, default=600)
    ap.add_argument("--v6", type=int, default=600)
    ap.add_argument("--v7", type=int, default=600)
    ap.add_argument("--v8", type=int, default=600)
    ap.add_argument("--v9", type=int, default=600)
    ap.add_argument("--v10", type=int, default=600)
    ap.add_argument("--v11", type=int, default=600)
    ap.add_argument("--v12", type=int, default=600)
    ap.add_argument("--v13", type=int, default=400)
    ap.add_argument("--v14", type=int, default=300)
    ap.add_argument("--v15", type=int, default=300)
    ap.add_argument("--v16", type=int, default=300)
    ap.add_argument("--v17", type=int, default=300)
    ap.add_argument("--v18", type=int, default=200)
    ap.add_argument("--v19", type=int, default=250)
    args = ap.parse_args()

    spark = get_session(app_name="fuzz-campaign")
    tables(spark, SF_DIR)
    duck = _pg_faithful_duck()

    failures = 0
    t0 = time.time()

    # differential grammars: CI covers [0, N_CASES*); sweep the tail above.
    for name, gen, lo, hi in (
        ("v1", gen_query, N_CASES, args.v1),
        ("v2", gen_query_v2, N_CASES_V2, args.v2),
        ("v3", gen_query_v3, N_CASES_V3, args.v3),
        ("v5", gen_query_v5, N_CASES_V5, args.v5),
        ("v6", gen_query_v6, N_CASES_V6, args.v6),
        ("v7", gen_query_v7, N_CASES_V7, args.v7),
        ("v8", gen_query_v8, N_CASES_V8, args.v8),
        ("v9", gen_query_v9, N_CASES_V9, args.v9),
        ("v10", gen_query_v10, N_CASES_V10, args.v10),
        ("v11", gen_query_v11, N_CASES_V11, args.v11),
        # round-13 grammars: v16 generate_series directions (DuckDB's
        # list-form spelling), v17 quantified = ANY 3VL corners, v18
        # julian extraction
        ("v16", gen_query_v16, N_CASES_V16, args.v16),
        ("v17", gen_query_v17, N_CASES_V17, args.v17),
        ("v18", gen_query_v18, N_CASES_V18, args.v18),
        # v19: multi-SRF select-list zip (round-13)
        ("v19", gen_query_v19, N_CASES_V19, args.v19),
    ):
        ran = 0
        for i in range(lo, hi):
            sql = gen(i)
            try:
                assert_differential(spark, duck, sql)
            except AssertionError as e:
                failures += 1
                print(f"FAIL {name}#{i}: {sql}\n  {e}", flush=True)
            except Exception as e:  # engine error = also a finding
                failures += 1
                print(f"ERROR {name}#{i}: {sql}\n  {type(e).__name__}: {e}",
                      flush=True)
            ran += 1
        print(f"[{name}] {ran} cases ({lo}..{hi}), "
              f"{failures} cumulative failures, {time.time()-t0:.0f}s",
              flush=True)

    # v12 (round-11): generator returns (pg_sql, column_types) — the
    # schema-typed hop shapes need the declared-type map
    ran = 0
    for i in range(N_CASES_V12, args.v12):
        sql, ct = gen_query_v12(i)
        try:
            assert_differential(spark, duck, sql, column_types=ct)
        except AssertionError as e:
            failures += 1
            print(f"FAIL v12#{i}: {sql}\n  {e}", flush=True)
        except Exception as e:
            failures += 1
            print(f"ERROR v12#{i}: {sql}\n  {type(e).__name__}: {e}",
                  flush=True)
        ran += 1
    print(f"[v12] {ran} cases, {failures} cumulative failures, "
          f"{time.time()-t0:.0f}s", flush=True)

    # v13/v15 (round-12): (pg_sql, column_types) generators; v14 runs
    # under standard_conforming_strings=True
    for name, gen, lo, hi, scs in (
        ("v13", gen_query_v13, N_CASES_V13, args.v13, False),
        ("v14", lambda i: (gen_query_v14(i), None), N_CASES_V14, args.v14, True),
        ("v15", gen_query_v15, N_CASES_V15, args.v15, False),
    ):
        ran = 0
        for i in range(lo, hi):
            sql, ct = gen(i)
            try:
                assert_differential(
                    spark, duck, sql, column_types=ct, scs=scs
                )
            except AssertionError as e:
                failures += 1
                print(f"FAIL {name}#{i}: {sql}\n  {e}", flush=True)
            except Exception as e:
                failures += 1
                print(f"ERROR {name}#{i}: {sql}\n  {type(e).__name__}: {e}",
                      flush=True)
            ran += 1
        print(f"[{name}] {ran} cases, {failures} cumulative failures, "
              f"{time.time()-t0:.0f}s", flush=True)

    # v4: Spark self-consistency (quantified vs expanded pattern match)
    ran = 0
    for i in range(N_CASES_V4, args.v4):
        quant, plain = gen_query_v4(i)
        try:
            got = sorted(map(tuple, spark.sql(translate_pg_sql(quant)).collect()))
            want = sorted(map(tuple, spark.sql(plain).collect()))
            if got != want:
                failures += 1
                print(f"FAIL v4#{i}: {quant}\n  vs {plain}", flush=True)
        except Exception as e:
            failures += 1
            print(f"ERROR v4#{i}: {quant}\n  {type(e).__name__}: {e}",
                  flush=True)
        ran += 1
    print(f"[v4] {ran} cases, {failures} cumulative failures, "
          f"{time.time()-t0:.0f}s", flush=True)

    # max(0, ...) per grammar: an arg below the CI count runs zero cases
    # (range is empty), so it must not subtract from the total
    total = sum(
        max(0, hi - lo)
        for hi, lo in (
            (args.v1, N_CASES), (args.v2, N_CASES_V2),
            (args.v3, N_CASES_V3), (args.v4, N_CASES_V4),
            (args.v5, N_CASES_V5), (args.v6, N_CASES_V6),
            (args.v7, N_CASES_V7), (args.v8, N_CASES_V8),
            (args.v9, N_CASES_V9), (args.v10, N_CASES_V10),
            (args.v11, N_CASES_V11), (args.v12, N_CASES_V12),
            (args.v13, N_CASES_V13), (args.v14, N_CASES_V14),
            (args.v15, N_CASES_V15), (args.v16, N_CASES_V16),
            (args.v17, N_CASES_V17), (args.v18, N_CASES_V18),
            (args.v19, N_CASES_V19),
        )
    )
    print(f"== fuzz campaign: {total} cases, {failures} failures ==",
          flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
