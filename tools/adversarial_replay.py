#!/usr/bin/env python3
"""Adversarial oracle replay — the fixture contract, stress-tested.

Perturbs a driver fixture directory (nulls, zeros, negatives, hostile
unicode/empty/repetitive text, zero vectors, huge norms) WITHOUT touching
primary-key columns, writes the result to an output directory with the same
table names/schemas, then the normal Verify + oracle_check pipeline replays
all 204 queries against DuckDB on it:

    python3 tools/adversarial_replay.py /root/testdata/sf0.001 /tmp/advdata 1311
    sbt -batch "runMain graft.Verify /tmp/advdata /tmp/verify_adv"
    python3 tools/oracle_check.py /tmp/advdata /tmp/verify_adv

Interpretation:
  - a query that CRASHES is an engine defect (the round-11 run found four:
    a streaming null-value NOT_NULL kill, an unguarded pct_change divide, a
    typed-map NPE on null text, and a loud-guard firing a query should have
    coalesced) — fix those;
  - a hash MISMATCH is usually an engine-vs-DuckDB semantic divergence on
    OUT-OF-CONTRACT data (the oracle SQL replicates the engine on the
    fixtures, e.g. its ASCII tokenizer regex vs the engine's unicode one) —
    triage, but only fix when the engine side is genuinely wrong.

Expected state after round 11: 0 crashes, ~153/204 hash-match.
"""
import random
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

HOSTILE_TEXTS = [
    "", " ", "\n\n\n", "a", "THE the The tHe", "naive cafe uber facade",
    "line1\nline1\nline2\nline1", "tab\tsep\tvals", 'quo"ted, and ,commas',
    "ééé café 中文文档测试 русский نص عربي",
    "zzz " * 500,
    "\U0001F600\U0001F680 emoji doc \U0001F4A9",
    "the and of to is " * 40,
    "x" * 3000,
    "1 2 3 4 5 6 7 8 9 10 11 12",
    "Mixed CASE With... ellipsis… and bullets:\n* one\n* two\n- three",
]

PASSTHROUGH = ["customer", "nation", "orders", "part", "region", "supplier"]


def perturb_documents(src, dst):
    t = pq.read_table(f"{src}/documents.parquet").to_pydict()
    n = len(t["doc_id"])
    for i in range(n):
        r = random.random()
        if r < 0.12:
            t["text"][i] = random.choice(HOSTILE_TEXTS)
        elif r < 0.20:
            t["text"][i] = None
        if random.random() < 0.10:
            t["lang"][i] = None
        if random.random() < 0.10:
            t["source"][i] = None
        if random.random() < 0.05:
            t["n_chars"][i] = None
        elif random.random() < 0.05:
            t["n_chars"][i] = 0
    for i in range(0, min(n, 40), 4):  # exact-dup text under distinct ids
        t["text"][i] = t["text"][(i + 1) % n]
    pq.write_table(
        pa.table(t, schema=pq.read_schema(f"{src}/documents.parquet")),
        f"{dst}/documents.parquet")


def perturb_events(src, dst):
    t = pq.read_table(f"{src}/events.parquet").to_pydict()
    for i in range(len(t["event_id"])):
        if random.random() < 0.10:
            t["value"][i] = None
        elif random.random() < 0.05:
            t["value"][i] = 0.0
        elif random.random() < 0.03:
            t["value"][i] = -abs(t["value"][i] or 1.0)
        if random.random() < 0.08:
            t["props"][i] = None
        if random.random() < 0.04:
            t["event_type"][i] = None
    pq.write_table(
        pa.table(t, schema=pq.read_schema(f"{src}/events.parquet")),
        f"{dst}/events.parquet")


def perturb_embeddings(src, dst):
    t = pq.read_table(f"{src}/embeddings.parquet").to_pydict()
    dim = len(t["embedding"][0])
    for i in range(len(t["vec_id"])):
        r = random.random()
        if r < 0.04:
            t["embedding"][i] = [0.0] * dim  # zero vector: no direction
        elif r < 0.07:
            t["embedding"][i] = [v * 1e6 for v in t["embedding"][i]]
        if random.random() < 0.08:
            t["label"][i] = None
    pq.write_table(
        pa.table(t, schema=pq.read_schema(f"{src}/embeddings.parquet")),
        f"{dst}/embeddings.parquet")


def perturb_lineitem(src, dst):
    t = pq.read_table(f"{src}/lineitem.parquet").to_pydict()
    for i in range(len(t["l_orderkey"])):
        if random.random() < 0.06:
            t["l_quantity"][i] = None
        elif random.random() < 0.03:
            t["l_quantity"][i] = 0.0
        if random.random() < 0.04:
            t["l_discount"][i] = 0.0
        if random.random() < 0.04:
            t["l_tax"][i] = None
    pq.write_table(
        pa.table(t, schema=pq.read_schema(f"{src}/lineitem.parquet")),
        f"{dst}/lineitem.parquet")


def main():
    if len(sys.argv) < 3:
        sys.exit(f"usage: {sys.argv[0]} <fixture-dir> <out-dir> [seed]")
    src, dst = sys.argv[1], sys.argv[2]
    random.seed(int(sys.argv[3]) if len(sys.argv) > 3 else 1311)
    import os
    os.makedirs(dst, exist_ok=True)
    perturb_documents(src, dst)
    perturb_events(src, dst)
    perturb_embeddings(src, dst)
    perturb_lineitem(src, dst)
    for t in PASSTHROUGH:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    print(f"adversarial dataset written to {dst}")


if __name__ == "__main__":
    main()
