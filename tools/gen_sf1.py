"""Generate the builder-owned sf1 bench derivative (10x sf0.1) under
/root/repo/.bench_data/sf1/.

The driver fixtures stop at sf0.1; the round-4 judge asked for one more
measured decade for the shuffle-heaviest operators. This derives sf1
DETERMINISTICALLY from the read-only sf0.1 fixtures (no RNG: every value
is a pure function of the source row and its replica index), so repeated
generations are byte-stable and scaling ratios compare like with like:

- documents: 10 replicas; new doc_id per replica; replica >0 gets a
  replica-specific suffix token so corpora stay distinct while each
  replica preserves the original near-dup structure (minhash bucket-size
  DISTRIBUTION is preserved; buckets don't merge across replicas).
- embeddings: 10 replicas; replica >0 perturbed by a tiny deterministic
  per-dimension offset (distinct vectors, same cluster geometry).
- events: 10 replicas; new user_id space per replica (10x users, same
  per-user session shape), timestamps shifted a few seconds per replica.
- orders: 10 replicas; new o_custkey space per replica (10x customers,
  same per-customer status-run structure for SCD2).
- lineitem/customer/supplier/part: 10 replicas with key offsets chosen
  CONSISTENTLY with orders (l_orderkey rides _ORD_SPAN, c_custkey rides
  _CST_SPAN, l_partkey/p_partkey share _PRT_SPAN, l_suppkey/s_suppkey
  share _SUP_SPAN) so every foreign key still joins within its replica.
- nation/region: copied verbatim (fixed dimensions).

All ten fixture tables are generated (the table registrar loads the full
set). Output is ~10x the 17 MB sf0.1 footprint. NEVER writes to
/root/testdata.

Usage: python tools/gen_sf1.py [--force]
"""

from __future__ import annotations

import os
import sys

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_data", "sf1")
REPLICAS = 10

# id offsets: one clean decimal span per table, far above sf0.1 maxima
_DOC_SPAN = 10_000  # sf0.1 max doc_id 4999
_VEC_SPAN = 10_000  # max vec_id 1999
_EVT_SPAN = 1_000_000  # max event_id 99999
_USR_SPAN = 10_000  # max user_id 1499
_ORD_SPAN = 1_000_000  # max o_orderkey 149999
_CST_SPAN = 100_000  # max o_custkey 14999
_PRT_SPAN = 100_000  # max l_partkey/p_partkey 19999
_SUP_SPAN = 10_000  # max l_suppkey/s_suppkey 999


def generate(force: bool = False) -> str:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    marker = os.path.join(DST, ".complete")
    if os.path.exists(marker) and not force:
        return DST
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    rep = f"(SELECT unnest(generate_series(0, {REPLICAS - 1})) AS r)"

    con.execute(f"""
COPY (
  SELECT d.doc_id + r.r * {_DOC_SPAN} AS doc_id,
         CASE WHEN r.r = 0 THEN d.text
              ELSE d.text || ' rep' || r.r || ' tok' || (d.doc_id % 977) END AS text,
         d.lang, d.source,
         CASE WHEN r.r = 0 THEN d.n_chars
              ELSE d.n_chars + 11 + len(CAST(r.r AS VARCHAR)) + len(CAST(d.doc_id % 977 AS VARCHAR)) END AS n_chars
  FROM read_parquet('{SRC}/documents.parquet') d CROSS JOIN {rep} r
) TO '{DST}/documents.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
COPY (
  SELECT e.vec_id + r.r * {_VEC_SPAN} AS vec_id,
         CASE WHEN r.r = 0 THEN e.embedding
              ELSE list_transform(e.embedding,
                     x -> CAST(x + 0.0005 * r.r * (((e.vec_id % 13) - 6) / 6.0) AS FLOAT)) END AS embedding,
         e.label
  FROM read_parquet('{SRC}/embeddings.parquet') e CROSS JOIN {rep} r
) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
COPY (
  SELECT v.event_id + r.r * {_EVT_SPAN} AS event_id,
         v.ts + to_seconds(r.r * 7) AS ts,
         v.user_id + r.r * {_USR_SPAN} AS user_id,
         v.event_type, v.value, v.props
  FROM read_parquet('{SRC}/events.parquet') v CROSS JOIN {rep} r
) TO '{DST}/events.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
COPY (
  SELECT o.o_orderkey + r.r * {_ORD_SPAN} AS o_orderkey,
         o.o_custkey + r.r * {_CST_SPAN} AS o_custkey,
         o.o_orderstatus, o.o_totalprice, o.o_orderdate, o.o_orderpriority
  FROM read_parquet('{SRC}/orders.parquet') o CROSS JOIN {rep} r
) TO '{DST}/orders.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
COPY (
  SELECT l.l_orderkey + r.r * {_ORD_SPAN} AS l_orderkey,
         l.l_partkey + r.r * {_PRT_SPAN} AS l_partkey,
         l.l_suppkey + r.r * {_SUP_SPAN} AS l_suppkey,
         l.l_linenumber, l.l_quantity, l.l_extendedprice, l.l_discount,
         l.l_tax, l.l_returnflag, l.l_linestatus, l.l_shipdate
  FROM read_parquet('{SRC}/lineitem.parquet') l CROSS JOIN {rep} r
) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
COPY (
  SELECT c.c_custkey + r.r * {_CST_SPAN} AS c_custkey,
         c.c_name || CASE WHEN r.r = 0 THEN '' ELSE '#r' || r.r END AS c_name,
         c.c_nationkey, c.c_acctbal, c.c_mktsegment
  FROM read_parquet('{SRC}/customer.parquet') c CROSS JOIN {rep} r
) TO '{DST}/customer.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
COPY (
  SELECT s.s_suppkey + r.r * {_SUP_SPAN} AS s_suppkey,
         s.s_name || CASE WHEN r.r = 0 THEN '' ELSE '#r' || r.r END AS s_name,
         s.s_nationkey, s.s_acctbal
  FROM read_parquet('{SRC}/supplier.parquet') s CROSS JOIN {rep} r
) TO '{DST}/supplier.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
COPY (
  SELECT p.p_partkey + r.r * {_PRT_SPAN} AS p_partkey,
         p.p_name || CASE WHEN r.r = 0 THEN '' ELSE ' r' || r.r END AS p_name,
         p.p_brand, p.p_type, p.p_size, p.p_retailprice
  FROM read_parquet('{SRC}/part.parquet') p CROSS JOIN {rep} r
) TO '{DST}/part.parquet' (FORMAT PARQUET)""")

    for dim in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{dim}.parquet')) "
            f"TO '{DST}/{dim}.parquet' (FORMAT PARQUET)"
        )

    con.close()
    with open(marker, "w") as f:
        f.write(f"replicas={REPLICAS} src={SRC}\n")
    return DST


if __name__ == "__main__":
    path = generate(force="--force" in sys.argv)
    import duckdb

    for t in (
        "documents", "embeddings", "events", "orders",
        "lineitem", "customer", "supplier", "part", "nation", "region",
    ):
        n = duckdb.sql(f"SELECT count(*) FROM '{path}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n}")
    print(f"sf1 ready at {path}")
