#!/usr/bin/env python3
"""Local dev harness mirroring the driver's DuckDB-oracle correctness gate.

NOT part of the library (the Scala engine has zero Python deps) — this only
replays what the driver does so oracle SQL is validated before each round:
read each `Verify`-dumped parquet, run the matching oracle SQL in DuckDB over
the same test tables, canonicalize (columns sorted by name, rows sorted by all
columns), and compare values.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # normalize datetime resolution: duckdb yields us/ns depending on source
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(
                pd.read_parquet(f"{out_dir}/{name}")
            )
            want = canon(con.execute(sql).df())
        except Exception as e:
            failures.append((name, f"error: {e}"))
            print(f"FAIL {name}: {e}")
            continue
        if list(got.columns) != list(want.columns):
            failures.append((name, f"columns {list(got.columns)} != {list(want.columns)}"))
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append((name, f"rows {len(got)} != {len(want)}"))
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
            # dtype check separately, as a warning (driver may hash dtypes)
            dt_g, dt_w = list(got.dtypes), list(want.dtypes)
            flag = "" if dt_g == dt_w else f"  [dtype diff: {list(zip(got.columns, dt_g, dt_w))}]"
            print(f"PASS {name} ({len(got)} rows){flag}")
        except AssertionError as e:
            failures.append((name, "value mismatch"))
            print(f"FAIL {name}: value mismatch\n{str(e)[:800]}")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
