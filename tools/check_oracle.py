#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir> [gate,gate,...]

For each query dir under verifyOutDir: read the Spark parquet result,
run the corresponding oracle SQL (oracle_sql.json) in DuckDB with the
sfDir tables registered as views, and compare the two the way the
DRIVER does — via pandas DataFrames with columns sorted by name and
rows sorted by all columns. That makes this tool sensitive to the two
failure classes the looser value-level compare missed in round 3:

  * array-valued cells (pandas sort_values raises "unhashable type:
    numpy.ndarray" — the driver errors the gate even when rows-only);
  * dtype drift (DuckDB HUGEINT -> pandas float64 vs Spark BIGINT ->
    int64 hash differently even when the values are equal).
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_frame(df, name, side):
    """Sort columns by name and rows by all columns, driver-style.
    Raises ValueError on array-valued cells (the driver would error)."""
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, (np.ndarray, list))).any():
            raise ValueError(
                f"{side} column '{c}' holds arrays — driver cannot "
                f"sort/hash it (gate {name} must emit scalars only)")
    return df.sort_values(by=list(df.columns), kind="mergesort") \
             .reset_index(drop=True)


def frames_equal(s, o):
    """Value compare with 6-dp float tolerance but exact dtype check."""
    for c in s.columns:
        # The driver hashes VALUES, so int32 vs int64 (same integers)
        # match — but int64 vs float64 (5 vs 5.0, e.g. DuckDB HUGEINT
        # from a window sum) mismatch. Compare dtype KIND, not width.
        sk, ok_ = s[c].dtype.kind, o[c].dtype.kind
        if sk != ok_ and not ({sk, ok_} <= {"i", "u"}):
            return False, f"dtype '{c}': spark={s[c].dtype} oracle={o[c].dtype}"
    for c in s.columns:
        a, b = s[c], o[c]
        if a.dtype.kind == "f":
            both_nan = a.isna() & b.isna()
            close = np.isclose(a.fillna(0), b.fillna(0),
                               rtol=0, atol=5e-7, equal_nan=True)
            if not (both_nan | (close & (a.isna() == b.isna()))).all():
                i = int(np.argmin(both_nan | close))
                return False, f"value '{c}' row {i}: {a[i]!r} != {b[i]!r}"
        else:
            if a.dtype.kind in "iu" and a.dtype != b.dtype:
                a, b = a.astype("int64"), b.astype("int64")
            if not a.equals(b):
                neq = a.ne(b) & ~(a.isna() & b.isna())
                i = int(neq.idxmax())
                return False, f"value '{c}' row {i}: {a[i]!r} != {b[i]!r}"
    return True, None


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            oracle_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(spark_df.columns) != sorted(oracle_df.columns):
            print(f"FAIL {name}: columns {sorted(spark_df.columns)} "
                  f"!= {sorted(oracle_df.columns)}")
            n_fail += 1
            continue
        try:
            s = canon_frame(spark_df, name, "spark")
            o = canon_frame(oracle_df, name, "oracle")
        except ValueError as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rowcount {len(s)} != {len(o)}")
            n_fail += 1
            continue
        ok, why = frames_equal(s, o)
        if ok:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {why}")
            n_fail += 1
    # Rows-only gates (no oracle SQL) are still read + sorted by the
    # driver, so array-valued columns error them too — scan their dumps.
    import os
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or name in oracles or (only and name not in only):
            continue
        try:
            df = con.execute(f"SELECT * FROM '{d}/*.parquet'").df()
            canon_frame(df, name, "spark")
            print(f"PASS {name} (rows-only, {len(df)} rows sortable)")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: rows-only dump unsortable: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
