#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness gate:
for each query parquet dumped by graft.Verify, run the oracle SQL from
oracle_sql.json over the same sf dir and compare the full sorted row sets
(columns sorted by name, values stringified, rows sorted)."""
import json, sys, glob, os
import duckdb

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df):
    cols = sorted(df.columns)
    rows = [tuple(str(v) for v in row) for row in
            df[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows)

fail = 0
for name, sql in sorted(oracle.items()):
    qdir = os.path.join(out_dir, name)
    if not os.path.isdir(qdir):
        print(f"MISSING-RESULT {name}")
        fail += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df()
        want = con.execute(sql).df()
    except Exception as e:
        print(f"SQL-ERROR {name}: {e}")
        fail += 1
        continue
    gc, gr = canon(got)
    wc, wr = canon(want)
    if gc != wc:
        print(f"SCHEMA-MISMATCH {name}: spark={gc} duckdb={wc}")
        fail += 1
    elif gr != wr:
        only_g = [r for r in gr if r not in set(wr)][:3]
        only_w = [r for r in wr if r not in set(gr)][:3]
        print(f"ROWS-MISMATCH {name}: spark={len(gr)} duckdb={len(wr)}"
              f" onlySpark={only_g} onlyDuck={only_w}")
        fail += 1
    else:
        print(f"OK {name} rows={len(gr)}")

rows_only = [d for d in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, d)) and d not in oracle]
for name in rows_only:
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')"
    ).fetchone()[0]
    print(f"ROWS-ONLY {name} rows={n}" + (" EMPTY!" if n == 0 else ""))

sys.exit(1 if fail else 0)
