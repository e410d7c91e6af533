#!/usr/bin/env python3
"""Generate a 100x scale tier (sf10) from the sf0.1 fixtures — one decade
past mk_sf1.py, for confirming the documented cost-class contracts of the
heavy operators (q40 IVF n^1.5, q142 SemDeDup n^1.5, q172 linear audit,
q202 linear encode, q210 linear eval) where the constants start to
matter. Writes parquet to target/sf10/ (never touches /root/testdata).

Same scheme as mk_sf1.py (read its header for the rationale), adapted to
100 copies:

- documents.text: copy i>0 appends the TWO-DIGIT copy index to every
  word (no separator; the corpus has zero digit-bearing tokens, checked,
  so the map is collision-free and bijective per copy). Within-copy
  shingle equality is preserved exactly; cross-copy gram vocabularies
  are disjoint.
- doc_id/vec_id offsets are 9_000 per copy — max id 895_999 stays BELOW
  the 1_000_000 planted-duplicate offset the recall envelopes key on
  (plantTextDups enforces this precondition since round 9).
- embeddings.embedding: per-copy sign mask (orthogonal transform: exact
  within-copy geometry, cross-copy cosines ~0).
- customer.c_name: copy i>0 gets a repeated 2-char prefix (p1 p2 p1 p2),
  so any two copies' prefixes differ in >=2 positions — cross-copy name
  pairs stay outside the distance-1 fuzzy-match reach.
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "target/sf10"
COPIES = 100

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW copies AS SELECT unnest(range({COPIES})) AS i")

def gen(table, sql):
    con.execute(
        f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT COUNT(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

for t in ("region", "nation"):
    gen(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

# per-domain offsets: each >> its sf0.1 max key; doc/vec stay below the
# 1M planted-envelope offset
KD = 9_000          # doc_id (max 4999) / vec_id (max 1999)
K = 100_000         # custkey / suppkey / partkey / user_id
KO = 10_000_000     # orderkey / event_id

# repeated 2-char prefix: distinct copies differ in >=2 edit positions
PFX = ("CASE WHEN i = 0 THEN '' ELSE "
       "chr(CAST(65 + i // 10 AS INTEGER)) || chr(CAST(97 + i % 10 AS INTEGER)) || "
       "chr(CAST(65 + i // 10 AS INTEGER)) || chr(CAST(97 + i % 10 AS INTEGER)) END")

gen("customer", f"""
  SELECT c_custkey + i*{K} AS c_custkey,
         {PFX} || c_name AS c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet' CROSS JOIN copies""")

gen("supplier", f"""
  SELECT s_suppkey + i*{K} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet' CROSS JOIN copies""")

gen("part", f"""
  SELECT p_partkey + i*{K} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM '{SRC}/part.parquet' CROSS JOIN copies""")

gen("orders", f"""
  SELECT o_orderkey + i*{KO} AS o_orderkey,
         o_custkey + i*{K} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet' CROSS JOIN copies""")

gen("lineitem", f"""
  SELECT l_orderkey + i*{KO} AS l_orderkey,
         l_partkey + i*{K} AS l_partkey,
         l_suppkey + i*{K} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet' CROSS JOIN copies""")

gen("events", f"""
  SELECT event_id + i*{KO} AS event_id, ts,
         user_id + i*{K} AS user_id, event_type, value, props
  FROM '{SRC}/events.parquet' CROSS JOIN copies""")

gen("documents", f"""
  SELECT doc_id + i*{KD} AS doc_id,
         CASE WHEN i = 0 THEN text
              ELSE array_to_string(list_transform(
                     string_split(text, ' '),
                     w -> w || CASE WHEN i < 10 THEN '0' ELSE '' END
                            || CAST(i AS VARCHAR)), ' ') END AS text,
         lang, source, n_chars
  FROM '{SRC}/documents.parquet' CROSS JOIN copies""")

gen("embeddings", f"""
  SELECT vec_id + i*{KD} AS vec_id,
         CASE WHEN i = 0 THEN embedding
              ELSE CAST(list_transform(embedding,
                     (x, d) -> CASE WHEN hash(d*131 + i*7919) % 2 = 0
                               THEN -x ELSE x END) AS FLOAT[])
         END AS embedding,
         label
  FROM '{SRC}/embeddings.parquet' CROSS JOIN copies""")

print(f"sf10 tier written to {DST}")
