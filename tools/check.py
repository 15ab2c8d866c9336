#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify output
against DuckDB oracle SQL on the same parquet tables, compare sorted
column-name-ordered values. Usage: check.py <sfdir> <verify_out>"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    d = f"{outdir}/{name}"
    if not os.path.isdir(d):
        print(f"MISSING  {name} (no spark output)"); fail += 1; continue
    files = glob.glob(f"{d}/*.parquet")
    try:
        spark_tbl = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        ora_tbl = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fail += 1; continue
    def norm(tbl):
        cols = sorted(tbl.column_names)
        rows = [tuple(str(tbl.column(c)[i].as_py()) for c in cols)
                for i in range(tbl.num_rows)]
        types = [str(tbl.schema.field(c).type) for c in cols]
        return cols, sorted(rows), types
    sc, sr, st = norm(spark_tbl)
    oc, orr, ot = norm(ora_tbl)
    if sc != oc:
        print(f"SCHEMA   {name}: spark={sc} oracle={oc}"); fail += 1
    # the driver's hash is type-aware: decimal128 vs int64 with equal
    # values still fails the gate (round-2 q16/q22/q37 lesson)
    elif st != ot:
        print(f"TYPES    {name}: spark={list(zip(sc, st))} "
              f"oracle={list(zip(oc, ot))}"); fail += 1
    elif sr != orr:
        diffs = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
        print(f"ROWS     {name}: {len(sr)} vs {len(orr)} rows; first diffs {diffs}")
        fail += 1
    else:
        print(f"OK       {name} ({len(sr)} rows)"); ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
