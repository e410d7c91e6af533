#!/usr/bin/env python3
"""Dev-only mirror of the driver's DuckDB-oracle correctness gate.

NOT part of the engine (the engine is pure Scala/Spark). This reproduces the
driver's compare so oracle-SQL mistakes surface locally before a round ends:
run graft.Verify first, then:

    python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir in <verifyOutDir>: load Spark's parquet result and the
DuckDB result of oracle_sql.json[qid] over the same tables; sort columns by
name, sort rows, compare values exactly (floats via repr equality, with a
secondary report of max abs diff when they differ).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    # ORACLE_SKIP: comma-separated qids to leave out — the deliberately
    # brute-force oracles (q97/q118 are O(n^2) by design, so the compare
    # checks blocking completeness) are infeasible for DuckDB itself at
    # the 10x sf1 tier even though the ENGINE runs them fine there
    skip = set(filter(None,
                      __import__("os").environ.get("ORACLE_SKIP", "")
                      .split(",")))
    n_pass = n_fail = 0
    for qid, sql in sorted(oracle.items()):
        if qid in skip:
            print(f"SKIP {qid} (ORACLE_SKIP)")
            continue
        try:
            duck = con.execute(sql).fetch_arrow_table()
            spark = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{qid}/*.parquet')"
            ).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {qid}: load error: {e}")
            n_fail += 1
            continue

        d_cols = sorted(duck.column_names)
        s_cols = sorted(spark.column_names)
        if d_cols != s_cols:
            print(f"FAIL {qid}: columns differ duck={d_cols} spark={s_cols}")
            n_fail += 1
            continue
        # dtype audit (warning only — the driver may compare types strictly)
        dtype_warn = []
        for c in d_cols:
            dt = duck.schema.field(c).type
            st = spark.schema.field(c).type
            if str(dt) != str(st):
                dtype_warn.append(f"{c}: duck={dt} spark={st}")
        if dtype_warn:
            print(f"WARN {qid}: dtype mismatch: {'; '.join(dtype_warn)}")
        if duck.num_rows != spark.num_rows:
            print(f"FAIL {qid}: rows duck={duck.num_rows} spark={spark.num_rows}")
            n_fail += 1
            continue

        d_rows = sorted(
            tuple(norm_cell(duck.column(c)[i].as_py()) for c in d_cols)
            for i in range(duck.num_rows))
        s_rows = sorted(
            tuple(norm_cell(spark.column(c)[i].as_py()) for c in s_cols)
            for i in range(spark.num_rows))
        if d_rows == s_rows:
            # also check row order as produced (driver may be order-sensitive)
            d_seq = [tuple(norm_cell(duck.column(c)[i].as_py()) for c in d_cols)
                     for i in range(duck.num_rows)]
            s_seq = [tuple(norm_cell(spark.column(c)[i].as_py()) for c in s_cols)
                     for i in range(spark.num_rows)]
            tag = "" if d_seq == s_seq else "  [row ORDER differs]"
            print(f"PASS {qid} ({duck.num_rows} rows){tag}")
            n_pass += 1
        else:
            bad = next(i for i, (a, b) in enumerate(zip(d_rows, s_rows))
                       if a != b)
            print(f"FAIL {qid}: first diff at sorted-row {bad}:")
            print(f"  duck : {d_rows[bad]}")
            print(f"  spark: {s_rows[bad]}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
