"""Local mirror of the driver's correctness gate: run every query in the
registry at a given SF via Spark AND its DuckDB oracle, compare row count,
column names, and values (order-insensitive; exact where our determinism
engineering applies, with a float report otherwise).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import traceback

import duckdb


def normalize(df):  # pandas DataFrame → sorted-by-all-columns records
    cols = sorted(df.columns)
    df = df[cols]
    recs = []
    for row in df.itertuples(index=False):
        rec = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                rec.append(("<null>",))
            elif isinstance(v, float):
                rec.append(("f", repr(v)))
            else:
                rec.append(("v", str(v)))
        recs.append(tuple(rec))
    recs.sort()
    return cols, recs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from youcruit_tap_rawpostgresql_spark.querybank import REGISTRY
    from youcruit_tap_rawpostgresql_spark.session import get_session

    spark = get_session(app_name="oracle-check")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    passed, failed, rows_only = [], [], []
    for name, case in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sdf = case.fn(spark, sf_dir).toPandas()
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

    print(
        f"\n== {len(passed)} passed, {len(failed)} failed, "
        f"{len(rows_only)} rows-only =="
    )
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
