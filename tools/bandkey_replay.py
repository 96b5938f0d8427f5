#!/usr/bin/env python3
"""Independent DuckDB arbitration for the r15 band-key packing: replay the
d3 oracle SQL (the STRING-keyed band/cap/star pipeline, exactly as the
driver's correctness gate runs it) over a corpus and diff it — EXCEPT both
ways — against the packed-key Spark output parquet.

Usage: bandkey_replay.py <sfDir> <sparkOutParquetDir>
(defaults: /tmp/sf100 /tmp/bandpack_new.parquet)

This is the same arbitration pattern that settled the r14 miscount: the
oracle's band key is built as mh_a||'_'||mh_b in SQL, fully independent of
the Spark-side key representation, so agreement here proves the packed
(bid, k1, k2) grouping produces the identical pair set.
"""
import json
import sys

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bandpack_new.parquet"

sql = json.load(open("/tmp/graft_verify/oracle_sql.json"))["d3_lsh_pairs"]

def src(p):  # single-file parquet (the replica) or a Spark output dir
    import os
    return p if os.path.isfile(p) else f"{p}/*.parquet"

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{src(sf + '/documents.parquet')}')")
con.execute(f"CREATE VIEW spark_out AS SELECT * FROM read_parquet('{src(out)}')")
con.execute(f"CREATE TABLE oracle AS {sql}")

n_o = con.execute("SELECT count(*) FROM oracle").fetchone()[0]
n_s = con.execute("SELECT count(*) FROM spark_out").fetchone()[0]
# est_sim is round(x, 6) on both sides but produced by different float
# paths; compare at the same 1e-6 grain the driver gate uses
a = con.execute("""
  SELECT count(*) FROM (
    SELECT doc_a, doc_b, CAST(floor(est_sim*1000000 + 0.5) AS BIGINT) FROM oracle
    EXCEPT
    SELECT doc_a, doc_b, CAST(floor(est_sim*1000000 + 0.5) AS BIGINT) FROM spark_out)
""").fetchone()[0]
b = con.execute("""
  SELECT count(*) FROM (
    SELECT doc_a, doc_b, CAST(floor(est_sim*1000000 + 0.5) AS BIGINT) FROM spark_out
    EXCEPT
    SELECT doc_a, doc_b, CAST(floor(est_sim*1000000 + 0.5) AS BIGINT) FROM oracle)
""").fetchone()[0]
print(f"oracle rows {n_o}, spark rows {n_s}, oracle-minus-spark {a}, spark-minus-oracle {b}")
ok = n_o == n_s and a == 0 and b == 0
print("PAIR SETS IDENTICAL" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
