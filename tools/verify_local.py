#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/verify_local.py [sfdir] [outdir]

Runs DuckDB on each oracle_sql.json entry over the same parquet tables,
loads the Spark result parquet, sorts columns by name, and compares
row-by-row (dates/decimals normalized to strings). Dev tool only — the
shipped library never depends on this.
"""
import json, sys, glob, os
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

with open(f"{outdir}/oracle_sql.json") as f:
    oracle = json.load(f)

def canon(rows):
    out = []
    for r in rows:
        out.append(tuple("NULL" if v is None else
                         (f"{v:.6f}" if isinstance(v, float) else str(v))
                         for v in r))
    return out

n_pass = n_fail = 0
for name in sorted(oracle):
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"MISSING  {name} (no spark output)")
        n_fail += 1
        continue
    try:
        duck = con.execute(oracle[name]).fetch_arrow_table()
        spark = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetch_arrow_table()
        dcols = sorted(duck.column_names)
        scols = sorted(spark.column_names)
        if dcols != scols:
            print(f"SCHEMA   {name}: duck={dcols} spark={scols}")
            n_fail += 1
            continue
        drows = canon(con.execute(
            "SELECT " + ",".join(f'"{c}"' for c in dcols) + " FROM duck").fetchall())
        srows = canon(con.execute(
            "SELECT " + ",".join(f'"{c}"' for c in scols) + " FROM spark").fetchall())
        if drows == srows:
            print(f"PASS     {name} ({len(srows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL     {name}: duck {len(drows)} rows vs spark {len(srows)}")
            for i, (d, s) in enumerate(zip(drows, srows)):
                if d != s:
                    print(f"  first diff at row {i}:\n    duck : {d}\n    spark: {s}")
                    break
    except Exception as e:
        print(f"ERROR    {name}: {e}")
        n_fail += 1

# rows-only entries (no oracle): report row counts
for name in sorted(os.listdir(outdir)):
    d = f"{outdir}/{name}"
    if os.path.isdir(d) and name not in oracle:
        n = con.execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
        print(f"ROWSONLY {name}: {n} rows")

print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
