#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF, then run each oracle SQL in DuckDB over the same parquet tables
and compare result multisets (columns sorted by name, rows sorted).

Usage: python3 scripts/check.py [sfdir] [outdir]
"""
import json, math, os, subprocess, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_df(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                              type(v).__name__ == 'ndarray' else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def col_kind(s: pd.Series) -> str:
    """Classify a column the way the driver's canonical-string hash sees it.
    DECIMAL round-trips differently per engine (DuckDB hands pandas float64,
    Spark parquet hands object(Decimal)) — surface that as a kind mismatch
    instead of letting a float-tolerant value compare mask it (r14's
    emb_pca_power escape)."""
    if s.dtype == object:
        nn = s.dropna()
        if len(nn) and type(nn.iloc[0]).__name__ == 'Decimal':
            return 'decimal'
        return 'o'
    if s.dtype.kind in ('i', 'u'):
        return 'i'
    return s.dtype.kind

def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame):
    a, b = norm_df(spark_df), norm_df(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA mismatch: spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS mismatch: spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        ka, kb = col_kind(av), col_kind(bv)
        if ka != kb and not (len(a) == 0):
            return (f"DTYPE mismatch col={c}: spark kind={ka} oracle kind={kb} "
                    f"— the driver's canonical-string hash rejects this even "
                    f"when float-tolerant values agree; align output types")
        try:
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                ok = ((av.isna() & bv.isna()) | (av == bv)).all()
            else:
                ok = av.astype(object).where(pd.notna(av), None).equals(
                    bv.astype(object).where(pd.notna(bv), None))
        except Exception as e:
            return f"COMPARE error on {c}: {e}"
        if not ok:
            bad = (~((av.isna() & bv.isna()) | (av.astype(object) == bv.astype(object)))).idxmax()
            return (f"VALUE mismatch col={c} row={bad}: "
                    f"spark={a[c][bad]!r} oracle={b[c][bad]!r}")
    return None

def main():
    if os.environ.get("SKIP_VERIFY") != "1":
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
            cwd="/root/repo", capture_output=True, text=True)
        sys.stdout.write(r.stdout[-3000:])
        if r.returncode != 0:
            print(r.stderr[-3000:]); sys.exit(1)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(OUT) if os.path.isdir(f"{OUT}/{d}"))
    n_pass = n_fail = n_rowsonly = 0
    # queries that threw inside graft.Verify have no parquet dir — count
    # each as a failure instead of silently shrinking the tally
    err_file = f"{OUT}/verify_errors.json"
    errored = set(json.load(open(err_file))) if os.path.exists(err_file) else set()
    for name in sorted(errored):
        n_fail += 1
        print(f"{'VERIFY_ERR':18} {name}: query threw in graft.Verify")
    # an oracle entry with no dumped result dir is also a failure
    for name in sorted(set(oracle) - set(names) - errored):
        n_fail += 1
        print(f"{'MISSING':18} {name}: oracle present but no result dumped")
    for name in names:
        if name in errored:
            continue  # stale dir from a prior run into the same OUT dir
        try:
            spark_df = pq.read_table(f"{OUT}/{name}").to_pandas()
        except Exception as e:
            n_fail += 1
            print(f"{'UNREADABLE':18} {name}: {e}")
            continue
        if name not in oracle:
            status = "ROWS_ONLY" if len(spark_df) > 0 else "ROWS_ONLY_EMPTY!"
            n_rowsonly += 1
            print(f"{status:18} {name} ({len(spark_df)} rows)")
            continue
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"{'ORACLE_SQL_ERR':18} {name}: {e}")
            continue
        err = compare(name, spark_df, odf)
        if err:
            n_fail += 1
            print(f"{'FAIL':18} {name}: {err}")
        else:
            n_pass += 1
            print(f"{'PASS':18} {name} ({len(spark_df)} rows)")
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    sys.exit(1 if n_fail else 0)

main()
