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


def main(sf_dir: str, out_dir: str, json_out: str = None) -> int:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    record = {}
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(
                pd.read_parquet(f"{out_dir}/{name}")
            )
            want = canon(con.execute(sql).df())
        except Exception as e:
            failures.append((name, f"error: {e}"))
            record[name] = {"match": False, "err": str(e)[:300]}
            print(f"FAIL {name}: {e}")
            continue
        if list(got.columns) != list(want.columns):
            failures.append((name, f"columns {list(got.columns)} != {list(want.columns)}"))
            record[name] = {"match": False, "err": f"columns {list(got.columns)} vs {list(want.columns)}"}
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append((name, f"rows {len(got)} != {len(want)}"))
            record[name] = {"match": False, "err": f"rows {len(got)} vs {len(want)}"}
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
            # dtype check separately, as a warning (driver may hash dtypes)
            dt_g, dt_w = list(got.dtypes), list(want.dtypes)
            flag = "" if dt_g == dt_w else f"  [dtype diff: {list(zip(got.columns, dt_g, dt_w))}]"
            record[name] = {"match": True, "rows": len(got), "err": None}
            print(f"PASS {name} ({len(got)} rows){flag}")
        except AssertionError as e:
            failures.append((name, "value mismatch"))
            record[name] = {"match": False, "err": "value mismatch"}
            print(f"FAIL {name}: value mismatch\n{str(e)[:800]}")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} queries match")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "total": len(oracle),
                       "passed": len(oracle) - len(failures),
                       "queries": record}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
