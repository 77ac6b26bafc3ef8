#!/usr/bin/env python3
"""Dev-only parity checker mirroring the driver's DuckDB-oracle compare.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/check_oracle.py <sfDir> <outDir> [substr ...]

Optional trailing args restrict the run to queries whose name contains any
of the given substrings (e.g. a quick re-check of one family, or skipping
oracle formulations that are slow at larger SFs).

For each query: loads the Spark parquet result and the DuckDB oracle result,
sorts columns by name, sorts rows, and compares values exactly (doubles must
be bit-identical — matching the driver's hash compare). Not part of the
library; uses driver-side-only python deps as a local stand-in for the driver.
"""
import sys, os, glob, json
import duckdb
import pandas as pd
import numpy as np


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # trailing args: substrings to include; "-name" entries EXCLUDE queries
    # whose name contains the substring (for oracle formulations that don't
    # scale to large SFs, e.g. recursive-CTE closures over dense graphs)
    only = [a for a in sys.argv[3:] if not a.startswith("-")]
    skip = [a[1:] for a in sys.argv[3:] if a.startswith("-")]
    if only:
        oracle = {k: v for k, v in oracle.items() if any(s in k for s in only)}
    for sub in skip:
        dropped = [k for k in oracle if sub in k]
        for k in dropped:
            print(f"SKIP {k} (excluded: {sub})")
        oracle = {k: v for k, v in oracle.items() if sub not in k}
    failed = []
    for name in sorted(oracle):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failed.append(name)
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failed.append(name)
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            failed.append(name)
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            failed.append(name)
            continue
        bad_cols = []
        for c in s.columns:
            a, b = s[c].values, d[c].values
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                af = a.astype(float)
                bf = b.astype(float)
                eq = (af == bf) | (np.isnan(af) & np.isnan(bf))
            else:
                av = pd.Series(a).astype(object).where(pd.Series(a).notna(), None)
                bv = pd.Series(b).astype(object).where(pd.Series(b).notna(), None)
                eq = np.array([x == y or (x is None and y is None) for x, y in zip(av, bv)])
            if not eq.all():
                i = int(np.argmin(eq))
                bad_cols.append((c, i, s[c].iloc[i], d[c].iloc[i], int((~eq).sum())))
        if bad_cols:
            print(f"FAIL {name}:")
            for c, i, sv, dv, n in bad_cols:
                print(f"   col {c}: {n} diffs; first at row {i}: spark={sv!r} duck={dv!r}")
            failed.append(name)
        else:
            # dtype note (driver may compare schemas; surface mismatches)
            dt = [(c, str(s[c].dtype), str(d[c].dtype)) for c in s.columns
                  if str(s[c].dtype) != str(d[c].dtype)]
            note = f"  [dtype notes: {dt}]" if dt else ""
            print(f"PASS {name} ({len(s)} rows){note}")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
