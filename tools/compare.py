#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query parquet in verifyOutDir, runs the matching oracle SQL from
oracle_sql.json in DuckDB (tables = parquet views over sfDir), sorts columns
by name, and compares row counts, schemas and values.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        got = pd.read_parquet(d)
        got = got[sorted(got.columns)].reset_index(drop=True)
        if name not in oracle:
            status = "ROWS_ONLY" if len(got) > 0 else "ROWS_ONLY_EMPTY!"
            print(f"{status:18} {name:28} rows={len(got)}")
            continue
        exp = con.sql(oracle[name]).df()
        exp = exp[sorted(exp.columns)].reset_index(drop=True)
        ok = True
        msgs = []
        if list(got.columns) != list(exp.columns):
            ok = False; msgs.append(f"cols {list(got.columns)} vs {list(exp.columns)}")
        elif len(got) != len(exp):
            ok = False; msgs.append(f"rows {len(got)} vs {len(exp)}")
        else:
            for c in got.columns:
                g, e = got[c], exp[c]
                if str(g.dtype) != str(e.dtype):
                    msgs.append(f"dtype[{c}] {g.dtype} vs {e.dtype}")
                try:
                    gn, en = g.isna(), e.isna()
                    same = bool((gn == en).all()) and (
                        g.equals(e) or bool((g[~gn] == e[~en]).all()))
                except Exception:
                    same = bool((g.astype(str) == e.astype(str)).all())
                if not same:
                    ok = False
                    diff = (g != e)
                    try:
                        idx = diff[diff].index[:3].tolist()
                        msgs.append(f"val[{c}] @{idx} got={g.iloc[idx].tolist()} exp={e.iloc[idx].tolist()}")
                    except Exception:
                        msgs.append(f"val[{c}] differs")
        if ok:
            n_pass += 1
            print(f"{'PASS':18} {name:28} rows={len(got)}" +
                  ("  [" + "; ".join(msgs) + "]" if msgs else ""))
        else:
            n_fail += 1
            print(f"{'FAIL':18} {name:28} " + "; ".join(msgs))
    print(f"\n{n_pass} pass, {n_fail} fail")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
