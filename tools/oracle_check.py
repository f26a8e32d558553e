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


def _jval(v):
    """JSON-safe scalar for evidence payloads (numpy types, NaT, bytes)."""
    try:
        if v is None or (isinstance(v, float) and v != v):
            return None
        if hasattr(v, "item"):
            v = v.item()
        if isinstance(v, (int, float, bool, str)):
            return v
        return repr(v)[:120]
    except Exception:
        return "<unrepr>"


def row_evidence(got: pd.DataFrame, want: pd.DataFrame, limit: int = 3):
    """Membership diff for a row-count mismatch: example rows present on
    only one side (first `limit` each, as column dicts)."""
    g = got.astype(str).apply("|".join, axis=1) if len(got) else pd.Series(dtype=str)
    w = want.astype(str).apply("|".join, axis=1) if len(want) else pd.Series(dtype=str)
    only_g = got.loc[~g.isin(set(w))].head(limit)
    only_w = want.loc[~w.isin(set(g))].head(limit)
    return {
        "only_in_engine": [{c: _jval(r[c]) for c in got.columns} for _, r in only_g.iterrows()],
        "only_in_oracle": [{c: _jval(r[c]) for c in want.columns} for _, r in only_w.iterrows()],
    }


def value_evidence(got: pd.DataFrame, want: pd.DataFrame):
    """First differing cell of an equal-shape value mismatch: row index,
    column, both values, and the row's identifying columns from each side."""
    for c in got.columns:
        g, w = got[c], want[c]
        neq = ~((g == w) | (g.isna() & w.isna()))
        if neq.any():
            i = int(neq.idxmax())
            return {
                "first_diff_col": c,
                "row_index": i,
                "engine_value": _jval(g.iloc[i]),
                "oracle_value": _jval(w.iloc[i]),
                "engine_row": {k: _jval(got[k].iloc[i]) for k in got.columns},
                "diff_cells": int(neq.sum()),
            }
    return {"first_diff_col": None}


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
            # an exception here is a CRASH (engine output unreadable or the
            # oracle SQL itself failing) — flag it explicitly so the
            # adversarial gate can fail on it regardless of triage state
            failures.append((name, f"error: {e}"))
            record[name] = {"match": False, "crashed": True, "shape": "crash",
                            "err": str(e)[:300]}
            print(f"FAIL {name}: {e}")
            continue
        if list(got.columns) != list(want.columns):
            failures.append((name, f"columns {list(got.columns)} != {list(want.columns)}"))
            record[name] = {"match": False, "crashed": False, "shape": "columns",
                            "err": f"columns {list(got.columns)} vs {list(want.columns)}"}
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append((name, f"rows {len(got)} != {len(want)}"))
            record[name] = {"match": False, "crashed": False, "shape": "rows",
                            "err": f"rows {len(got)} vs {len(want)}",
                            "rows_engine": len(got), "rows_oracle": len(want),
                            "evidence": row_evidence(got, want)}
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
            record[name] = {"match": False, "crashed": False, "shape": "value",
                            "err": "value mismatch", "rows_engine": len(got),
                            "evidence": value_evidence(got, want)}
            print(f"FAIL {name}: value mismatch\n{str(e)[:800]}")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} queries match")
    if json_out:
        # adversarial datasets carry their generator seed + source fixture
        # (seed-logged property discipline) — pass both through so the
        # report artifact can record exact replay instructions
        seed, adv_source = None, None
        try:
            with open(f"{sf_dir}/adversarial_seed.json") as f:
                marker = json.load(f)
                seed = marker.get("seed")
                adv_source = marker.get("source")
        except (OSError, ValueError):
            pass
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "seed": seed, "adv_source": adv_source,
                       "total": len(oracle),
                       "passed": len(oracle) - len(failures),
                       "queries": record}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
