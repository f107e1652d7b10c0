#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir] [query ...]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` already ran (or
runs it with --run). For each query: load the Spark parquet result and
the DuckDB oracle result, sort columns by name, sort rows, compare
values exactly; report per-query status.
"""
import json, sys, glob, subprocess
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    outdir = args[1] if len(args) > 1 else "/tmp/verify_out"
    only = set(args[2:])
    if "--run" in sys.argv:
        subprocess.run(["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
                       check=True, capture_output=True, text=True, cwd="/root/repo")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output")
                n_fail += 1
                continue
            sp = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            du = norm(con.execute(sql).fetchdf())
            if list(sp.columns) != list(du.columns):
                print(f"FAIL {name}: columns spark={list(sp.columns)} duck={list(du.columns)}")
                n_fail += 1
                continue
            if len(sp) != len(du):
                print(f"FAIL {name}: rows spark={len(sp)} duck={len(du)}")
                n_fail += 1
                continue
            # exact value compare, column by column
            bad = []
            warned = []
            for c in sp.columns:
                a, b = sp[c], du[c]
                if str(a.dtype) != str(b.dtype):
                    # The driver's hash compare is dtype-sensitive (e.g.
                    # DuckDB HUGEINT vs Spark BIGINT fails it even when
                    # values match) — surface every coercion we perform.
                    warned.append((c, str(a.dtype), str(b.dtype)))
                try:
                    b = b.astype(a.dtype)
                except Exception:
                    pass
                if not a.equals(b):
                    neq = (a != b) & ~(a.isna() & b.isna())
                    idx = neq[neq].index[:3].tolist()
                    bad.append((c, str(a.dtype), str(b.dtype),
                                [(a.iloc[i], b.iloc[i]) for i in idx]))
            if bad:
                print(f"FAIL {name}: value diffs {bad}")
                n_fail += 1
            else:
                w = f" DTYPE-WARN {warned}" if warned else ""
                print(f"PASS {name} ({len(sp)} rows){w}")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
