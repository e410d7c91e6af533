#!/usr/bin/env python3
"""Generate a 10x scale tier (sf1) from the sf0.1 fixtures, for scaling
experiments: runtimes at sf1 vs sf0.1 expose any operator whose cost
grows superlinearly in data volume (the 100 TB smoke test the small SFs
can't give). Writes parquet to target/sf1/ (never touches /root/testdata).

Scaling scheme: 10 copies with per-copy key offsets so every FK
relationship stays intact (customer copy i <-> orders copy i, etc).
Content columns that feed quadratic-candidate operators are perturbed so
candidate volume scales LINEARLY, the way a real 10x corpus would:

- documents.text: copy i>0 appends the copy digit to EVERY word (no
  separator: the engine tokenizes on \\W+, so "hello1" must stay ONE
  token -- a separator character would inject a hot digit token between
  every word and skew simhash/gram statistics). The token map is
  bijective, so within-copy shingle equality (and therefore the
  engineered near-dup pairs) is preserved exactly; across copies the
  gram vocabularies are disjoint, so no cross-copy candidates exist.
  Per-copy gram document-frequency distribution is identical to the
  original -- a 10x corpus with 10x vocabulary, not 10 identical corpora.
- embeddings.embedding: copy i>0 flips the sign of a copy-specific
  subset of dimensions. A sign mask is an orthogonal transform: all
  within-copy dot products/norms are exactly preserved (ANN neighbor
  structure identical per copy), while cross-copy cosines decorrelate to
  ~0 -- no cross-copy near-dup explosion.
- customer.c_name: copy i>0 gets a 2-char per-copy prefix, putting
  cross-copy name pairs at edit distance >=2 (out of the distance-1
  fuzzy-match reach) while within-copy distances are unchanged.

region/nation stay unscaled (dimensions). Timestamps are unchanged:
10x rows per time bucket, which is what a denser corpus looks like.
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "target/sf1"
COPIES = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW copies AS SELECT unnest(range({COPIES})) AS i")

def gen(table, sql):
    con.execute(
        f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT COUNT(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

# dimensions pass through unscaled
for t in ("region", "nation"):
    gen(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

# entity-key offsets, one per key domain (all >> the sf0.1 max key)
K = 100_000        # custkey / suppkey / partkey / doc_id / vec_id / user_id
KO = 10_000_000    # orderkey / event_id

gen("customer", f"""
  SELECT c_custkey + i*{K} AS c_custkey,
         CASE WHEN i = 0 THEN c_name
              ELSE chr(CAST(65 + i AS INTEGER)) || CAST(i AS VARCHAR)
                   || c_name END AS c_name,
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
  SELECT doc_id + i*{K} AS doc_id,
         CASE WHEN i = 0 THEN text
              ELSE array_to_string(list_transform(
                     string_split(text, ' '),
                     w -> w || CAST(i AS VARCHAR)), ' ') END AS text,
         lang, source, n_chars
  FROM '{SRC}/documents.parquet' CROSS JOIN copies""")

gen("embeddings", f"""
  SELECT vec_id + i*{K} AS vec_id,
         CASE WHEN i = 0 THEN embedding
              ELSE CAST(list_transform(embedding,
                     (x, d) -> CASE WHEN hash(d*131 + i*7919) % 2 = 0
                               THEN -x ELSE x END) AS FLOAT[])
         END AS embedding,
         label
  FROM '{SRC}/embeddings.parquet' CROSS JOIN copies""")

print(f"sf1 tier written to {DST}")
