#!/usr/bin/env python3
"""Record per-entry DuckDB wall-times as the in-repo baseline.

After ten rounds of BASELINE.json publishing no per-query numbers, the
repo defines the honest comparison itself (r11 verdict #3): every
SQL-oracled entry's oracle already runs in DuckDB over the same parquet
tables — time those runs on this machine and write BASELINE_DUCKDB.json.
graft.Bench then embeds each entry's `duckdb_sec` next to its Spark
seconds in the per-round bench JSON.

Usage: duckdb_baseline.py <sfDir> <verifyOutDir-with-oracle_sql.json> [reps]

Methodology mirrors the bench: every query runs `reps` times (default 3),
the MIN is recorded; results are fully materialized (fetchall) so DuckDB
cannot defer work past the timer. Caveat recorded in the output: DuckDB
executes the ORACLE formulation (plain SQL over raw parquet), while many
graft entries do strictly more work end-to-end (collection builds,
streaming ingestion, commits) — ratios are a floor comparison for the
QUERY shapes, not an apples-to-apples engine race on lifecycle entries.
"""
import json, sys, threading, time

import duckdb

sfdir = sys.argv[1]
outdir = sys.argv[2]
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
budget = float(sys.argv[4]) if len(sys.argv) > 4 else 120.0  # per-query cap, sec

con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

def timed(sql):
    """One run under the budget; None = interrupted (query over budget)."""
    timer = threading.Timer(budget, con.interrupt)
    timer.start()
    try:
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        return time.perf_counter() - t0
    except duckdb.InterruptException:
        return None
    finally:
        timer.cancel()

oracle = json.load(open(f'{outdir}/oracle_sql.json'))
timings = {}
skipped = []
for i, (name, sql) in enumerate(sorted(oracle.items())):
    best = None
    try:
        for _ in range(reps):
            dt = timed(sql)
            if dt is None:
                break
            best = dt if best is None else min(best, dt)
        if best is None:
            skipped.append(name)
            print(f"{name}: OVER BUDGET ({budget}s) — skipped", file=sys.stderr)
        else:
            timings[name] = round(best, 4)
    except Exception as e:  # noqa: BLE001 - record, don't abort the sweep
        print(f"{name}: ERROR {e}", file=sys.stderr)
    print(f"[{i + 1}/{len(oracle)}] {name}: {timings.get(name)}", flush=True)

out = {
    "sf": sfdir,
    "reps": reps,
    "budget_sec": budget,
    "over_budget": sorted(skipped),
    "note": ("min-of-reps DuckDB wall-time of each entry's ORACLE SQL over "
             "the raw parquet tables on this machine; lifecycle entries "
             "(collection builds, streaming, commits) do strictly more work "
             "on the Spark side than their oracle replay; over_budget lists "
             "oracles DuckDB could not finish inside the per-query budget — "
             "entries where Spark finishing AT ALL is already the win"),
    "duckdb_sec": timings,
}
with open('BASELINE_DUCKDB.json', 'w') as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(f"wrote BASELINE_DUCKDB.json with {len(timings)} entries")
