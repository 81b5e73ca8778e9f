#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark parquet result,
run the corresponding oracle SQL (oracle_sql.json) in DuckDB with the
sfDir tables registered as views, sort columns by name and rows by all
columns, and compare values.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        canon_row = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    canon_row.append("NaN")
                else:
                    canon_row.append(round(v, 6))
            else:
                canon_row.append(v)
        out.append(tuple(str(x) for x in canon_row))
    return sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = spark_rel.fetchall()
            oracle_rel = con.execute(sql)
            oracle_cols = [d[0] for d in oracle_rel.description]
            oracle_rows = oracle_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        sc, oc = sorted(spark_cols), sorted(oracle_cols)
        if sc != oc:
            print(f"FAIL {name}: columns {sc} != {oc}")
            n_fail += 1
            continue
        s_ix = [spark_cols.index(c) for c in sc]
        o_ix = [oracle_cols.index(c) for c in oc]
        s = canon([[r[i] for i in s_ix] for r in spark_rows])
        o = canon([[r[i] for i in o_ix] for r in oracle_rows])
        if len(s) != len(o):
            print(f"FAIL {name}: rowcount {len(s)} != {len(o)}")
            n_fail += 1
        elif s != o:
            diff = [(a, b) for a, b in zip(s, o) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
