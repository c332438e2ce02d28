"""Generate the builder-owned sf10 bench derivative (10x sf1) under
/root/repo/.bench_data/sf10/ — round-5 judge directive 3.

Purpose: one more measured decade for the five steepest (still
sub-linear) scalers from the sf1 census — text_tfidf_topk (3.69x/decade),
text_ngram_novelty (6.1x), text_ngram_topk (5.7x), dedup_ngram_jaccard
(5.1x), sim_ann_ivf (2.58x). Those ops read documents and embeddings
(lineitem is scaled too as the relational anchor); the remaining tables
are copied verbatim from sf1 so the table registrar loads, but nothing
is measured on them at this SF — scaling every table would cost ~10x
the disk for no extra evidence.

Same determinism contract as gen_sf1.py: no RNG, every value a pure
function of the source row and replica index, so regenerations are
byte-stable. Replica suffixes use a DIFFERENT token shape (' q<r> w<h>')
than sf1's (' rep<r> tok<h>') so second-generation replicas stay
distinct from first-generation ones and near-dup buckets don't merge
across decades. NEVER writes to /root/testdata.

Usage: python tools/gen_sf10.py [--force]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench_data",
    "sf10",
)
REPLICAS = 10

# id offsets: one clean decimal span per table, above sf1 maxima
# (sf1 max doc_id 99_999, vec_id 91_999, l_orderkey 9_149_999,
#  l_partkey 919_999, l_suppkey 90_999)
_DOC_SPAN = 100_000
_VEC_SPAN = 100_000
_ORD_SPAN = 10_000_000
_PRT_SPAN = 1_000_000
_SUP_SPAN = 100_000


def generate(force: bool = False) -> str:
    import duckdb

    from tools.gen_sf1 import generate as gen_sf1

    src = gen_sf1()  # sf10 derives from sf1
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
              ELSE d.text || ' q' || r.r || ' w' || (d.doc_id % 883) END AS text,
         d.lang, d.source,
         CASE WHEN r.r = 0 THEN d.n_chars
              ELSE d.n_chars + 5 + len(CAST(r.r AS VARCHAR)) + len(CAST(d.doc_id % 883 AS VARCHAR)) END AS n_chars
  FROM read_parquet('{src}/documents.parquet') d CROSS JOIN {rep} r
) TO '{DST}/documents.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
COPY (
  SELECT e.vec_id + r.r * {_VEC_SPAN} AS vec_id,
         CASE WHEN r.r = 0 THEN e.embedding
              ELSE list_transform(e.embedding,
                     x -> CAST(x + 0.00007 * r.r * (((e.vec_id % 17) - 8) / 8.0) AS FLOAT)) END AS embedding,
         e.label
  FROM read_parquet('{src}/embeddings.parquet') e CROSS JOIN {rep} r
) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
COPY (
  SELECT l.l_orderkey + r.r * {_ORD_SPAN} AS l_orderkey,
         l.l_partkey + r.r * {_PRT_SPAN} AS l_partkey,
         l.l_suppkey + r.r * {_SUP_SPAN} AS l_suppkey,
         l.l_linenumber, l.l_quantity, l.l_extendedprice, l.l_discount,
         l.l_tax, l.l_returnflag, l.l_linestatus, l.l_shipdate
  FROM read_parquet('{src}/lineitem.parquet') l CROSS JOIN {rep} r
) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)""")

    # unscaled tables: verbatim sf1 copies (registrar completeness only)
    for t in ("events", "orders", "customer", "supplier", "part", "nation", "region"):
        shutil.copyfile(
            os.path.join(src, f"{t}.parquet"), os.path.join(DST, f"{t}.parquet")
        )

    con.close()
    with open(marker, "w") as f:
        f.write(f"replicas={REPLICAS} src={src} scaled=documents,embeddings,lineitem\n")
    return DST


if __name__ == "__main__":
    path = generate(force="--force" in sys.argv)
    import duckdb

    for t in ("documents", "embeddings", "lineitem"):
        n = duckdb.sql(f"SELECT count(*) FROM '{path}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n}")
    print(f"sf10 ready at {path}")
