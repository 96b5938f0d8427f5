#!/usr/bin/env python3
"""Build an Nx replica of the driver's parquet tables for scale probes.

Fact tables are replicated with key columns shifted per copy so joins and
dedup stay semantically sane (copy 0 is the original data); dimension
tables pass through unchanged. Usage:

    python3 tools/make_replica.py [src_sfdir] [out_dir] [copies]

Default: /root/testdata/sf0.1 -> /tmp/sfbig x10. Then:

    SPARK_GRAFT_SF_DIR=/tmp/sfbig sbt -batch "runMain graft.Bench"
"""
import sys, os
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# --skew: additionally (a) collapse 30% of replicated lineitem rows onto ONE
# hot order key (pathological join-key skew for AQE's skew-join split) and
# (b) collapse every 10th document's text onto one boilerplate string (a hot
# LSH band orders of magnitude past HOT_BAND_CAP, plus a massive exact-dup
# group) — the combined skew+dedup adversarial probe
SKEW = len(sys.argv) > 4 and sys.argv[4] == "--skew"
BOILER = ("identical boilerplate document text shared by every tenth row "
          "for hot band probing with enough words to shingle properly")

# table -> list of key columns to shift per copy (by i * (max(col)+1))
SHIFT = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "part": ["p_partkey"],
}
PASSTHROUGH = ["region", "nation", "customer", "supplier"]

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

for t, keys in SHIFT.items():
    src = f"read_parquet('{SRC}/{t}.parquet')"
    cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()]
    offs = {k: con.execute(f"SELECT max({k}) + 1 FROM {src}").fetchone()[0]
            for k in keys}
    selects = []
    for i in range(N):
        exprs = ", ".join(
            f"{c} + {i * offs[c]} AS {c}" if c in keys else c for c in cols)
        selects.append(f"SELECT {exprs} FROM {src}")
    union = " UNION ALL ".join(selects)
    if SKEW and t == "lineitem":
        union = (f"SELECT * REPLACE (CASE WHEN l_linenumber % 3 = 0 THEN 1 "
                 f"ELSE l_orderkey END AS l_orderkey) FROM ({union})")
    if SKEW and t == "documents":
        union = (f"SELECT * REPLACE (CASE WHEN doc_id % 10 = 0 THEN '{BOILER}' "
                 f"ELSE text END AS text) FROM ({union})")
    con.execute(f"COPY ({union}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows ({N}x)")

for t in PASSTHROUGH:
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
        f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: passthrough")
