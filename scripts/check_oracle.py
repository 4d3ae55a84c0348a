#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import duckdb, json, sys
sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))
fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    try:
        mine = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
    except Exception as e:
        print(f"{name}: MISSING OUTPUT ({e})"); fails += 1; continue
    try:
        ref = con.sql(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR ({e})"); fails += 1; continue
    schema_ok = sorted(mine.columns) == sorted(ref.columns)
    a = mine[sorted(mine.columns)].reset_index(drop=True)
    b = ref[sorted(ref.columns)].reset_index(drop=True)
    same = schema_ok and a.equals(b)
    print(f"{name}: rows={len(a)}/{len(b)} schema={'ok' if schema_ok else 'MISMATCH'} exact={same}")
    if not same:
        fails += 1
        if schema_ok and len(a) == len(b):
            for c in a.columns:
                if not a[c].equals(b[c]):
                    d = a[c] != b[c]
                    print(f"  col {c} ({a[c].dtype}/{b[c].dtype}) ndiff={d.sum()} "
                          f"mine={a[c][d].head(3).tolist()} ref={b[c][d].head(3).tolist()}")
        elif schema_ok:
            print(f"  row count differs")
        else:
            print(f"  cols mine={sorted(mine.columns)} ref={sorted(ref.columns)}")
sys.exit(1 if fails else 0)
