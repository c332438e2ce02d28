"""Local mirror of the driver's correctness gate: run every query in the
registry at a given SF via Spark AND its DuckDB oracle, compare row count,
column names, and values (order-insensitive; exact where our determinism
engineering applies, with a float report otherwise).

Usage: python tools/check_oracle.py [--vanilla] [--shuffle SEED] [sf_dir] [query ...]

``--shuffle SEED`` runs the cases in a seeded-random order — catches
inter-query state pollution (temp-view overwrites, cache aliasing) that a
fixed registry order can mask.

``--vanilla`` mirrors the driver exactly: a stock SparkSession with no
engine tuning (default shuffle partitions, broadcast threshold, no UTC
pin) — catches any correctness dependence on our session configs.

Driver parity rule (round-10 postmortem): any query whose Spark output
schema contains a top-level ArrayType/MapType/StructType column FAILS
here loudly — the round driver's pandas canonicalizer crashes on such
columns (`unhashable type: 'list'`), and this mirror must never be
kinder than the contract it mirrors.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import traceback

import duckdb


def normalize(df):  # pandas DataFrame → sorted-by-all-columns records
    cols = sorted(df.columns)
    df = df[cols]
    def norm_val(v):
        # sequence columns: numpy arrays (DuckDB / Arrow) and Python lists
        # (non-Arrow toPandas) must normalize identically, element-wise
        if hasattr(v, "tolist") and not hasattr(v, "split"):
            v = v.tolist()
        if isinstance(v, (list, tuple)):
            return ("a", tuple(norm_val(x) for x in v))
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return ("<null>",)
        if isinstance(v, float):
            return ("f", repr(v))
        return ("v", str(v))

    recs = []
    for row in df.itertuples(index=False):
        recs.append(tuple(norm_val(v) for v in row))
    recs.sort()
    return cols, recs


def main() -> None:
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    shuffle_seed = None
    if "--shuffle" in args:
        i = args.index("--shuffle")
        shuffle_seed = int(args[i + 1])
        del args[i : i + 2]
    first_n = None
    if "--first" in args:
        # check only the first N registry entries — the driver's
        # correctness gate is exactly `--first 50` (round-9: this flag
        # was reached for before it existed; names-after-sf_dir still
        # works and composes with it)
        i = args.index("--first")
        first_n = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from youcruit_tap_rawpostgresql_spark.querybank import REGISTRY

    registry_items = list(REGISTRY.items())
    if first_n is not None:
        registry_items = registry_items[:first_n]
    if shuffle_seed is not None:
        import random

        random.Random(shuffle_seed).shuffle(registry_items)

    if vanilla:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        from youcruit_tap_rawpostgresql_spark.session import get_session

        spark = get_session(app_name="oracle-check")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    verdicts = run_cases(spark, con, registry_items, sf_dir, only=only)
    passed, failed, rows_only = (
        verdicts["passed"],
        verdicts["failed"],
        verdicts["rows_only"],
    )

    # a requested name that was never RUN (misspelled, or outside a
    # --first window) must not read as a green gate (round-9
    # self-review: `--first 50 <name beyond 50>` printed '0 passed,
    # 0 failed' and exited 0)
    missing = only - {name for name, _ in registry_items}
    for name in sorted(missing):
        print(f"FAIL {name}: not in the checked registry slice")
        failed.append(name)
    print(
        f"\n== {len(passed)} passed, {len(failed)} failed, "
        f"{len(rows_only)} rows-only =="
    )
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


def run_cases(spark, con, registry_items, sf_dir="/root/testdata/sf0.001", only=None):
    """The mirror's case loop, extracted so tests can pin its behavior
    (notably the complex-output-schema rejection below). Returns
    ``{"passed": [...], "failed": [...], "rows_only": [...]}``."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    passed, failed, rows_only = [], [], []
    for name, case in registry_items:
        if only and name not in only:
            continue
        try:
            frame = case.fn(spark, sf_dir)
            # Driver parity (round-10 postmortem): the ROUND DRIVER's
            # pandas canonicalizer sort_values-crashes on top-level
            # list/dict columns (`unhashable type: 'list'` → an `err`
            # row), but this mirror's normalize() used to tuple-ify
            # them and pass — the mirror said 325/325 while the driver
            # said 48/50. A mirror must not be kinder than the contract
            # it mirrors: reject complex top-level output columns LOUDLY
            # here, before any value comparison. Serialize sequence
            # outputs with to_json(...) on both engines instead.
            complex_cols = [
                f.name
                for f in frame.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if complex_cols:
                print(
                    f"FAIL {name}: top-level complex output columns "
                    f"{complex_cols} — the round driver's pandas "
                    "canonicalizer cannot sort list values; wrap them "
                    "in to_json() on both the Spark and oracle side"
                )
                failed.append(name)
                continue
            sdf = frame.toPandas()
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            failed.append(name)
            continue
        if case.oracle is None:
            rows_only.append(name)
            print(f"ROWS-ONLY {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.execute(case.oracle).fetchdf()
        except Exception:
            print(f"FAIL {name}: oracle error")
            traceback.print_exc()
            failed.append(name)
            continue
        scols, srecs = normalize(sdf)
        ocols, orecs = normalize(odf)
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} vs {ocols}")
            failed.append(name)
            continue
        if len(srecs) != len(orecs):
            print(f"FAIL {name}: rowcount {len(srecs)} vs {len(orecs)}")
            failed.append(name)
            continue
        if srecs != orecs:
            # find first diff for debugging
            ndiff = sum(1 for a, b in zip(srecs, orecs) if a != b)
            print(f"FAIL {name}: {ndiff}/{len(srecs)} differing rows")
            for a, b in zip(srecs, orecs):
                if a != b:
                    print(f"  spark:  {a}")
                    print(f"  oracle: {b}")
                    break
            failed.append(name)
            continue
        passed.append(name)
        print(f"PASS {name} ({len(srecs)} rows)")
    return {"passed": passed, "failed": failed, "rows_only": rows_only}


if __name__ == "__main__":
    main()
