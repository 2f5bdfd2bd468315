#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py [sfDir] [outDir] [--json PATH]
Runs each oracle_sql.json entry in DuckDB over the parquet tables and
compares (column-name-sorted, row-sorted) against the Spark parquet dumps.

--json PATH additionally writes a per-gate artifact shaped exactly like
the driver's CORRECTNESS_r{N}.json ({gate: {rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err}}) so per-query adjudication
never depends on the driver's drop arriving intact (it came back empty
in rounds 13 and 14).
"""
import duckdb, json, sys
import pandas as pd

args = [a for a in sys.argv[1:] if not a.startswith("--")]
json_out = None
if "--json" in sys.argv:
    json_out = sys.argv[sys.argv.index("--json") + 1]
    if json_out in args:
        args.remove(json_out)
sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
out = args[1] if len(args) > 1 else "target/verify_out"
report = {}


def record(name, rows_match=False, schema_match=False, hash_match=False,
           spark_rows=None, oracle_rows=None, err=None):
    report[name] = {
        "rows_match": rows_match, "schema_match": schema_match,
        "hash_match": hash_match, "spark_rows": spark_rows,
        "oracle_rows": oracle_rows, "err": err,
    }
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracles = json.load(open(f"{out}/oracle_sql.json"))
bad = 0
# Coverage tripwire: every DEFINED gate (queries.json, written by Verify)
# must have produced a result dump — a gate that errored out upstream must
# fail the compare, not silently shrink the checked set (r6 shipped 111/118
# with zero alarms). Gates without oracle SQL still need their dump present.
try:
    defined = set(json.load(open(f"{out}/queries.json")))
except FileNotFoundError:
    defined = set(oracles)  # older dump dirs predate queries.json
import os as _os
missing = sorted(n for n in defined
                 if not _os.path.isdir(f"{out}/{n}"))
for name in missing:
    print(f"{name}: MISSING OUTPUT (gate defined but no result dump)")
    record(name, err="missing output: gate defined but no result dump")
    bad += 1
import time as _time
slow = []  # (seconds, gate) — surfaced at the end so sweep logs name the
           # oracles that dominate the sf0.1 leg's wall clock
# Oracle families share SQL verbatim (17 ANN gates pin one brute-force
# window; d17/d18 re-run one recursive closure; r1/r2/st17 one BM25
# derivation): memoize DuckDB results by exact SQL text — 144 distinct
# statements for 183 gates, and the duplicates include the heaviest
# (the sweep's sf0.1 leg was ~95% DuckDB work). Downstream column-sort/
# row-sort build NEW frames, so the cached one is never mutated.
oracle_cache = {}
for name in sorted(oracles):
    if name in missing:
        continue  # already reported MISSING OUTPUT above
    _t0 = _time.time()
    try:
        got = pd.read_parquet(f"{out}/{name}")
        sql = oracles[name]
        if sql in oracle_cache:
            exp = oracle_cache[sql]
        else:
            exp = con.sql(sql).df()
            oracle_cache[sql] = exp
        slow.append((_time.time() - _t0, name))
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"{name}: COLUMN MISMATCH got={list(got.columns)} exp={list(exp.columns)}")
            record(name, rows_match=len(got) == len(exp),
                   spark_rows=len(got), oracle_rows=len(exp),
                   err=f"column mismatch got={list(got.columns)} exp={list(exp.columns)}")
            bad += 1
            continue
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        if len(gs) != len(es):
            print(f"{name}: ROWCOUNT got={len(gs)} exp={len(es)}")
            record(name, schema_match=True,
                   spark_rows=len(gs), oracle_rows=len(es),
                   err=f"rowcount got={len(gs)} exp={len(es)}")
            bad += 1
            continue
        if gs.equals(es):
            print(f"{name}: OK ({len(gs)} rows)")
            record(name, rows_match=True, schema_match=True,
                   hash_match=True, spark_rows=len(gs), oracle_rows=len(es))
        else:
            diff = (gs != es) & ~(gs.isna() & es.isna())
            nbad = diff.any(axis=1).sum()
            print(f"{name}: VALUES differ in {nbad} rows")
            print(gs[diff.any(axis=1)].head(3))
            print(es[diff.any(axis=1)].head(3))
            record(name, rows_match=True, schema_match=True,
                   spark_rows=len(gs), oracle_rows=len(es),
                   err=f"values differ in {nbad} rows")
            bad += 1
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}: {e}")
        record(name, err=f"{type(e).__name__}: {e}")
        bad += 1
total = len(oracles) + len([m for m in missing if m not in oracles])
if json_out:
    with open(json_out, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
for sec, name in sorted(slow, reverse=True)[:8]:
    if sec >= 5.0:
        print(f"[oracle-cost] {name}: {sec:.1f} s")
print(f"--- {total - bad}/{total} oracle-checked queries OK ---")
sys.exit(1 if bad else 0)
