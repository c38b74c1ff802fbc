#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/oracle_check.py <sf_dir> <verify_out_dir>

Registers each testdata parquet as a DuckDB view, runs every oracle SQL from
oracle_sql.json, and compares against the Spark result parquet: columns
sorted by name, rows sorted, exact value comparison (with a report of max
numeric deviation when inexact).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(x):
    # arrays/lists -> tuples so row comparison is by value (the driver
    # hashes stringified values, which has the same semantics)
    if isinstance(x, (list, tuple)):
        return tuple(canon(y) for y in x)
    if hasattr(x, "tolist") and not isinstance(x, (str, bytes)):
        t = x.tolist()
        return tuple(canon(y) for y in t) if isinstance(t, list) else t
    return x

def norm(rows):
    out = [tuple(canon(x) for x in r) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        res = con.execute(
            f"SELECT * FROM '{d}/*.parquet'").fetchdf()
        res = res.reindex(sorted(res.columns), axis=1)
        if name not in oracle:
            print(f"  {name}: NO-ORACLE rows={len(res)} " +
                  ("PASS(rows>0)" if len(res) > 0 else "FAIL(empty)"))
            continue
        exp = con.execute(oracle[name]).fetchdf()
        exp = exp.reindex(sorted(exp.columns), axis=1)
        ok_schema = list(res.columns) == list(exp.columns)
        # Dtype audit: the driver hashes stringified pandas values, so a
        # DuckDB HUGEINT/DECIMAL arm (fetchdf -> float64/object) diverges
        # from a Spark BIGINT arm (int64) even when values are equal.
        dtype_mismatch = []
        if ok_schema:
            for c in res.columns:
                da, db = str(res[c].dtype), str(exp[c].dtype)
                if da != db:
                    dtype_mismatch.append((c, da, db))
        ok_dtype = not dtype_mismatch
        a, b = norm(res.itertuples(index=False)), norm(exp.itertuples(index=False))
        ok_rows = len(a) == len(b)
        exact = a == b
        status = "PASS" if (ok_schema and exact and ok_dtype) else "FAIL"
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        print(f"  {name}: {status} rows={len(a)}/{len(b)} schema_match={ok_schema} cols={list(res.columns)} vs {list(exp.columns)}")
        if dtype_mismatch:
            print(f"    DTYPE-MISMATCH (spark vs oracle): {dtype_mismatch}")
        if not exact and ok_rows and ok_schema:
            # report worst numeric deviation
            worst = 0.0; worst_row = None
            for ra, rb in zip(a, b):
                for xa, xb in zip(ra, rb):
                    if isinstance(xa, float) and isinstance(xb, float):
                        d0 = abs(xa - xb)
                        if d0 > worst:
                            worst = d0; worst_row = (ra, rb)
                    elif xa != xb:
                        worst = float("inf"); worst_row = (ra, rb)
                        break
            print(f"    max_abs_diff={worst} example={worst_row}")
    print(f"TOTAL: pass={n_pass} fail={n_fail}")
    return n_fail

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
