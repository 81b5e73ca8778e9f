#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir> [gate,gate,...] [--atol X]

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

Floats are compared EXACTLY by default — bit-level, so `-0.0 != 0.0`
— because the driver hashes value reprs and a single signed-zero cell
fails its hash (round 8 shipped a red `events_ols_trend` precisely
because the old `atol=5e-7` + Python's `-0.0 == 0.0` hid it).
`--atol X` restores the tolerance compare as an explicit DIAGNOSTIC
mode (useful to separate "algorithm wrong" from "last-digit ulp"),
never as the acceptance bar.
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


def frames_equal(s, o, atol=None):
    """Value compare: exact (bit-level, zero-sign-aware) floats by
    default, exact dtype-kind check always; `atol` switches floats to
    the legacy tolerance compare for DIAGNOSTIC runs only."""
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
            av = a.to_numpy(dtype="float64")
            bv = b.to_numpy(dtype="float64")
            both_nan = np.isnan(av) & np.isnan(bv)
            if atol is not None:
                close = np.isclose(np.nan_to_num(av), np.nan_to_num(bv),
                                   rtol=0, atol=atol)
                eq = both_nan | (close & (np.isnan(av) == np.isnan(bv)))
            else:
                # Driver-faithful: identical bits (so -0.0 != 0.0) or
                # both-NaN. repr('-0.0') != repr('0.0') is exactly how
                # the driver's hash sees a signed-zero cell.
                eq = (av.view("int64") == bv.view("int64")) | both_nan
            if not eq.all():
                i = int(np.argmin(eq))
                return False, f"value '{c}' row {i}: {a[i]!r} != {b[i]!r}"
        else:
            if a.dtype.kind in "iu" and a.dtype != b.dtype:
                a, b = a.astype("int64"), b.astype("int64")
            if not a.equals(b):
                neq = a.ne(b) & ~(a.isna() & b.isna())
                i = int(neq.idxmax())
                return False, f"value '{c}' row {i}: {a[i]!r} != {b[i]!r}"
    return True, None


def main(sf_dir, out_dir, only=None, atol=None):
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
        ok, why = frames_equal(s, o, atol)
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
    argv = list(sys.argv[1:])
    atol = None
    if "--atol" in argv:
        i = argv.index("--atol")
        atol = float(argv[i + 1])
        del argv[i:i + 2]
    only = set(argv[2].split(",")) if len(argv) > 2 else None
    sys.exit(main(argv[0], argv[1], only, atol))
