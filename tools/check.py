#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracle SQL vs Verify.scala output.

Mimics the driver's t2 gate strictly: for each query, load the Spark result
parquet and run the oracle SQL in DuckDB over views named after the testdata
tables; sort columns by name, sort rows, stringify values, compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        rel = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        scols = [d[0] for d in rel.description]
        srows = rel.fetchall()
        if name not in oracle:
            status = "rows-only"
            ok = len(srows) > 0
            print(f"{'PASS' if ok else 'FAIL'} {name} ({status}, rows={len(srows)})")
            n_pass += ok; n_fail += (not ok)
            continue
        try:
            orel = con.execute(oracle[name])
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}"); n_fail += 1; continue
        if len(sr) != len(orr):
            print(f"FAIL {name}: row count spark={len(sr)} oracle={len(orr)}"); n_fail += 1
            continue
        if sr != orr:
            bad = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs:")
            for a, b in bad:
                print(f"  spark : {a}\n  oracle: {b}")
            n_fail += 1
            continue
        print(f"PASS {name} (rows={len(sr)})")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
