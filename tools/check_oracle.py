#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, read the Spark result parquet, sort
columns by name and rows by value, and compare cell-by-cell (floats to
~1e-9 relative, so genuine semantic diffs surface but last-ulp noise and
the driver's hash compare are both anticipated)."""
import sys, json, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = sys.argv[3:] if len(sys.argv) > 3 else None

con = duckdb.connect()
import os
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    # Spark-written tables (e.g. the sf1-synth corpus) are DIRECTORIES of
    # part files; driver testdata is single files — glob the former
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):
        p += "/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    try:
        exp = con.sql(sql)
        exp_cols = sorted(exp.columns)
        exp_rows = con.sql(f"SELECT {', '.join(exp_cols)} FROM exp").fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {str(e)[:200]}")
        fails.append(name); continue
    try:
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        got_cols = sorted(got.columns)
        got_rows = con.sql(f"SELECT {', '.join(got_cols)} FROM got").fetchall()
    except Exception as e:
        print(f"FAIL {name}: spark result read error: {str(e)[:200]}")
        fails.append(name); continue
    if exp_cols != got_cols:
        print(f"FAIL {name}: cols oracle={exp_cols} spark={got_cols}")
        fails.append(name); continue
    if len(exp_rows) != len(got_rows):
        print(f"FAIL {name}: rows oracle={len(exp_rows)} spark={len(got_rows)}")
        fails.append(name); continue
    def key(r):
        return tuple((str(type(v)), str(v)) if not isinstance(v, float)
                     else ("f", round(v, 9)) for v in r)
    exp_rows.sort(key=key); got_rows.sort(key=key)
    bad = None
    for er, gr in zip(exp_rows, got_rows):
        for c, (ev, gv) in zip(exp_cols, zip(er, gr)):
            if isinstance(ev, float) and isinstance(gv, float):
                if ev != gv and not (math.isclose(ev, gv, rel_tol=1e-9, abs_tol=1e-12)):
                    bad = (c, ev, gv); break
            elif ev != gv:
                bad = (c, ev, gv); break
        if bad: break
    if bad:
        print(f"FAIL {name}: first diff col={bad[0]} oracle={bad[1]!r} spark={bad[2]!r}")
        fails.append(name)
    else:
        # exact-equality audit for floats (driver hashes values)
        exact = all(ev == gv for er, gr in zip(exp_rows, got_rows)
                    for ev, gv in zip(er, gr))
        tag = "OK " if exact else "OK~"   # OK~ = close but not bit-equal
        print(f"{tag} {name} rows={len(exp_rows)}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} pass; fails: {fails}")
sys.exit(1 if fails else 0)
