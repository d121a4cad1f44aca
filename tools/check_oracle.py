#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares shape, column names, and cell values (strict equality after
column-name sort + stringification). Queries without oracle SQL are reported
as rows-only.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    return df.reset_index(drop=True)


def main() -> int:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    with open(f"{outdir}/oracle_sql.json") as fh:
        oracle = json.load(fh)

    import glob
    names = sorted(p.split("/")[-1] for p in glob.glob(f"{outdir}/*") if not p.endswith(".json"))
    failures = 0
    # Verify writes <name>.FAILED markers for queries that threw (r6
    # failure contract) — surface them as err rows instead of letting the
    # query silently vanish from the report.
    for marker in sorted(n for n in names if n.endswith(".FAILED")):
        qname = marker[: -len(".FAILED")]
        with open(f"{outdir}/{marker}") as fh:
            msg = fh.read().strip()
        print(f"ERR   {qname}: query failed in Verify: {msg[:160]}")
        failures += 1
    names = [n for n in names if not n.endswith(".FAILED")]
    for name in names:
        try:
            spark_df = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark output: {e}")
            failures += 1
            continue
        if name not in oracle:
            print(f"ROWS  {name}: rows={len(spark_df)} (rows-only, no oracle)")
            if len(spark_df) == 0:
                print(f"      WARNING: empty rows-only result")
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            failures += 1
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
            failures += 1
            continue
        if a.shape != b.shape:
            print(f"FAIL  {name}: shape spark={a.shape} duck={b.shape}")
            failures += 1
            continue
        neq = (a != b)
        if neq.any().any():
            bad_cols = [c for c in a.columns if neq[c].any()]
            i = neq.any(axis=1).idxmax()
            print(f"FAIL  {name}: value mismatch cols={bad_cols} first_row={i}")
            for c in bad_cols[:3]:
                print(f"      {c}: spark={a.at[i, c]} duck={b.at[i, c]}")
            failures += 1
            continue
        print(f"OK    {name}: rows={len(a)} cols={len(a.columns)}")
    print(f"\n{'ALL GREEN' if failures == 0 else str(failures) + ' FAILURES'} ({len(names)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
