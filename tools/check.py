#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracle SQL vs Verify.scala output.

Mimics the driver's t2 gate strictly: the Spark result parquet is read with
pandas/pyarrow (decimals stay `Decimal`, int64 stays int64) while the oracle
SQL runs in DuckDB and is fetched via `.df()` (DECIMAL and HUGEINT both
collapse to float64).  Round-1 lesson: a Spark DECIMAL(x,2) column therefore
stringifies as '7611972.00' against the oracle's '7611972.0' and the hash
mismatches even though values are equal — so queries must emit DOUBLE /
BIGINT / STRING output columns, never DECIMAL, and oracles must CAST
sum(BIGINT) (a HUGEINT in DuckDB) back to BIGINT.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        # np.float64 subclasses float, so this branch intercepts it too;
        # repr(float(v)) normalizes both to the plain-Python form
        # ('0.5', never 'np.float64(0.5)' under numpy >= 2).
        if math.isnan(v):
            return "<null>"
        return repr(float(v))
    try:
        import numpy as np
        if isinstance(v, np.floating):
            if math.isnan(float(v)):
                return "<null>"
            return repr(float(v))
        if isinstance(v, np.integer):
            return str(int(v))
        if isinstance(v, np.bool_):
            return str(bool(v))
    except ImportError:
        pass
    if isinstance(v, bytes):
        return v.hex()
    if v is pd.NaT:
        return "<null>"
    return str(v)


def norm_df(df):
    cols = list(df.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(norm_cell(r[i]) for i in order) for r in df.itertuples(index=False, name=None)]
    rows.sort()
    return [cols[i] for i in order], rows


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
        files = sorted(glob.glob(f"{qdir}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            ok = len(sdf) > 0
            print(f"{'PASS' if ok else 'FAIL'} {name} (rows-only, rows={len(sdf)})")
            n_pass += ok; n_fail += (not ok)
            continue
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        sc, sr = norm_df(sdf)
        oc, orr = norm_df(odf)
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
