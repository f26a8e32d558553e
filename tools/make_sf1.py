#!/usr/bin/env python3
"""Synthesize an sf1.0 BENCH-ONLY scale point from the driver's sf0.1 tables.

NOT part of the library and NOT a correctness input (the driver's oracle gate
runs on its own sf0.001/0.01 parquet; this exists solely so the 24 bench
queries can be timed at 10x the official scale — round-12 verdict item 5:
"the 100x-scale claims rest on plan shape alone").

Construction: 10 key-offset replicas of every scaling table (offset 10M per
copy — far above any sf0.1 key, so the replicas' key spaces are disjoint and
every FK relationship survives verbatim). Text/embedding payloads are
PERTURBED per copy (" repN" suffix / +N*1e-4 per dim) so dedup/LSH/ANN
queries see 10x the corpus, not 10 exact copies of it — 10 identical copies
would square the per-bucket candidate pairs and measure an artifact, not
scaling. region/nation are dimension tables and copy through unchanged.

Usage: python3 tools/make_sf1.py [/root/testdata/sf0.1 /tmp/sf1.0 [copies]]
"""
import os
import sys

import duckdb

COPIES = 10  # default; third CLI arg overrides (e.g. 30 -> an sf3.0 point)
OFF = 10_000_000  # per-copy key offset; sf0.1 keys are all < 1M


def main(src: str, dst: str, copies: int = COPIES) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    rep = f"CROSS JOIN range({copies}) r(i)"

    def emit(table: str, select: str, scaled: bool = True) -> None:
        frm = f"read_parquet('{src}/{table}.parquet') {rep if scaled else ''}"
        con.execute(f"COPY (SELECT {select} FROM {frm}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {n} rows")

    emit("region", "*", scaled=False)
    emit("nation", "*", scaled=False)
    emit("customer",
         "c_custkey + i*{o} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment".format(o=OFF))
    emit("supplier",
         "s_suppkey + i*{o} AS s_suppkey, s_name, s_nationkey, s_acctbal".format(o=OFF))
    emit("part",
         "p_partkey + i*{o} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice".format(o=OFF))
    emit("orders",
         ("o_orderkey + i*{o} AS o_orderkey, o_custkey + i*{o} AS o_custkey, "
          "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority").format(o=OFF))
    emit("lineitem",
         ("l_orderkey + i*{o} AS l_orderkey, l_partkey + i*{o} AS l_partkey, "
          "l_suppkey + i*{o} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
          "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate").format(o=OFF))
    emit("events",
         ("event_id + i*{o} AS event_id, ts, user_id + i*{o} AS user_id, "
          "event_type, value, props").format(o=OFF))
    # text perturbed per copy: within-copy duplicate structure (the dedup
    # queries' target) is preserved, cross-copy exact/near duplication is not
    # manufactured
    emit("documents",
         ("doc_id + i*{o} AS doc_id, text || ' rep' || i AS text, lang, source, "
          "n_chars + 5 AS n_chars").format(o=OFF))
    emit("embeddings",
         ("vec_id + i*{o} AS vec_id, "
          "list_transform(embedding, x -> CAST(x + i * 1e-4 AS FLOAT)) AS embedding, "
          "label").format(o=OFF))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "/root/testdata/sf0.1", a[1] if len(a) > 1 else "/tmp/sf1.0",
         int(a[2]) if len(a) > 2 else COPIES)
