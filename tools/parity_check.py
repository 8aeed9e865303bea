#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate: run each oracle SQL
from verify-out/oracle_sql.json in DuckDB over the same parquet tables,
and compare against the Spark result parquet (columns sorted by name,
rows sorted by all columns, exact value equality).

Usage: python3 tools/parity_check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    import os
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # manifest first: a query Verify recorded as crashed fails ONCE, up
    # front, and is skipped by the oracle loop (no double count, and a
    # stale output dir can't mask the crash)
    manifest_path = os.path.join(out_dir, "manifest.json")
    crashed = set()
    min_rows = {}
    if os.path.exists(manifest_path):
        manifest = json.load(open(manifest_path))
        expected = set(manifest["queries"])
        crashed = set(manifest.get("failed", []))
        # declared minimum output sizes for rows-only queries (absent key
        # = 1, i.e. emptiness is a failure unless declared intentional)
        min_rows = manifest.get("min_rows", {})
    else:
        # no manifest (old Verify binary / partial run): fall back to
        # listing whatever output directories exist
        expected = set(oracle) | {n for n in os.listdir(out_dir)
                                  if os.path.isdir(os.path.join(out_dir, n))}
    failures = 0
    for name in sorted(crashed):
        print(f"FAIL {name}: Verify recorded a crash for this query")
        failures += 1
    for name, sql in sorted(oracle.items()):
        if name in crashed:
            continue
        try:
            expect = canon(con.sql(sql).df())
            got = canon(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        if list(expect.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(expect.columns)}")
            failures += 1
            continue
        if expect.dtypes.tolist() != got.dtypes.tolist():
            print(f"WARN {name}: dtypes {got.dtypes.tolist()} vs {expect.dtypes.tolist()}")
        if len(expect) != len(got):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(expect)}")
            failures += 1
            continue
        if not expect.equals(got):
            neq = (expect != got) & ~(expect.isna() & got.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(expect)} rows differ; first:")
            print(pd.concat([expect[bad].head(2), got[bad].head(2)]))
            failures += 1
            continue
        print(f"ok   {name} ({len(expect)} rows)")
    # rows-only entries (no oracle): report row counts, and FAIL any
    # query declared in the manifest whose output directory is missing
    # (a crashed rows-only query must not look green by absence).
    for name in sorted(expected - set(oracle) - crashed):
        p = os.path.join(out_dir, name)
        if not os.path.isdir(p):
            print(f"FAIL {name}: declared in manifest but no output written")
            failures += 1
            continue
        try:
            n = con.sql(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
        except Exception as e:
            print(f"FAIL {name}: unreadable output ({e})")
            failures += 1
            continue
        need = min_rows.get(name, 1)
        if n < need:
            print(f"FAIL {name}: {n} rows < declared minimum {need} (no oracle)")
            failures += 1
        else:
            print(f"rows {name}: {n} (no oracle, min {need})")
    for name in sorted(set(oracle) - expected):
        print(f"FAIL {name}: oracle SQL declared but query missing from manifest")
        failures += 1
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
