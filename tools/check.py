#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from `<outdir>/oracle_sql.json` in DuckDB against the
parquet tables in `<sfdir>`, loads the Spark result dumped by graft.Verify at
`<outdir>/<name>/`, and compares: column names (sorted), row count, and values
(rows sorted by all columns; floats with tolerance AND exact-after-round).

Usage: python3 tools/check.py [outdir] [sfdir]
"""
import sys, json, glob, math
import duckdb
import pandas as pd
import numpy as np

OUTDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
SFDIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SFDIR}/{t}.parquet')")

oracle = json.load(open(f"{OUTDIR}/oracle_sql.json"))

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # unify numerics
    for c in df.columns:
        if pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype("int64").astype("float64")
        else:
            df[c] = df[c].astype("string")
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)

n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        duck = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        n_fail += 1
        continue
    try:
        spark = pd.read_parquet(f"{OUTDIR}/{name}")
    except Exception as e:
        print(f"FAIL {name}: spark output missing: {e}")
        n_fail += 1
        continue
    sc, dc = sorted(spark.columns), sorted(duck.columns)
    if sc != dc:
        print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
        n_fail += 1
        continue
    if len(spark) != len(duck):
        print(f"FAIL {name}: rowcount spark={len(spark)} duck={len(duck)}")
        n_fail += 1
        continue
    # Dtype-KIND gate, BEFORE normalize() erases it: the driver's hash is
    # dtype-sensitive, so a Spark int64 column against a DuckDB float64
    # (e.g. SUM(BIGINT) -> HUGEINT -> float64 in pandas) fails the driver
    # even when every value matches. normalize() casts both to float64 and
    # structurally cannot see this class (that's how rg1-rg3 shipped red in
    # round 11). Integer-vs-floating is the only kind pair DuckDB/Spark
    # legitimately disagree on; flag it as a hard FAIL here.
    kind_bad = None
    for c in sorted(spark.columns):
        sk, dk = spark[c].dtype.kind, duck[c].dtype.kind
        num = {"i", "u", "f"}
        if sk in num and dk in num and ((sk == "f") != (dk == "f")):
            kind_bad = f"col {c} dtype kind: spark={spark[c].dtype} duck={duck[c].dtype}"
            break
    if kind_bad:
        print(f"FAIL {name}: {kind_bad} (driver hash would mismatch; "
              f"CAST the oracle column to BIGINT/DOUBLE to match Spark)")
        n_fail += 1
        continue
    s, d = normalize(spark), normalize(duck)
    bad = None
    for c in s.columns:
        sv, dv = s[c], d[c]
        if sv.dtype == "float64":
            a, b = sv.to_numpy(), dv.to_numpy()
            ok = np.isclose(a, b, rtol=1e-6, atol=1e-9, equal_nan=True)
            exact = np.round(a, 6)
            exactb = np.round(b, 6)
            # flag if tolerance passes but a straight 6-dp hash would differ
            hash_risky = ok.all() and not np.array_equal(
                exact, exactb, equal_nan=True)
            if not ok.all():
                i = int(np.argmin(ok))
                bad = f"col {c} row {i}: spark={a[i]} duck={b[i]}"
                break
            if hash_risky:
                print(f"WARN {name}: col {c} tolerance-equal but round-6 differs")
        else:
            if not sv.equals(dv):
                neq = sv != dv
                neq = neq | (sv.isna() ^ dv.isna())
                i = int(np.argmax(neq.to_numpy()))
                bad = f"col {c} row {i}: spark={sv[i]!r} duck={dv[i]!r}"
                break
    if bad:
        print(f"FAIL {name}: {bad}")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(spark)} rows)")
        n_pass += 1

# queries without oracle get a rows-only check
no_oracle = [g.split("/")[-1] for g in glob.glob(f"{OUTDIR}/*")
             if not g.endswith(".json") and g.split("/")[-1] not in oracle]
for name in sorted(no_oracle):
    try:
        spark = pd.read_parquet(f"{OUTDIR}/{name}")
        print(f"ROWS-ONLY {name}: {len(spark)} rows")
    except Exception as e:
        print(f"FAIL {name}: unreadable: {e}")
        n_fail += 1

print(f"\n{n_pass} pass, {n_fail} fail, {len(no_oracle)} rows-only")
sys.exit(1 if n_fail else 0)
