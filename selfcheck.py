#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (builder tooling only, not
part of the shipped library): run graft.Verify at a given SF, then execute each
oracle_sql.json query in DuckDB over the same parquet tables and compare
row count / schema / values (rows and columns sorted) per query.

Usage: python3 selfcheck.py [sfDir] [outDir] [--skip-verify] [--json FILE]

--json FILE: additionally record per-query results in the driver's
CORRECTNESS_r{N}.json shape (rows_match/schema_match/hash_match/rows/err)
— used to persist the r14 sf10 oracle pass as a first-class artifact.
"""
import argparse
import json
import os, math, subprocess, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

# argparse (ADVICE r14): the hand-rolled sys.argv parsing raised IndexError
# when --json was the last arg and mis-bound SF when flags preceded the
# positionals ('selfcheck.py --json f' set SF="--json").
_ap = argparse.ArgumentParser(description=__doc__)
_ap.add_argument("sfDir", nargs="?", default="/root/testdata/sf0.01")
_ap.add_argument("outDir", nargs="?", default="/root/repo/target/verify_out")
_ap.add_argument("--skip-verify", action="store_true")
_ap.add_argument("--json", metavar="FILE", default=None,
                 help="also record per-query results in the driver's "
                      "CORRECTNESS_r{N}.json shape")
_args = _ap.parse_args()
SF = _args.sfDir
OUT = Path(_args.outDir)
JSON_OUT = _args.json
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if not _args.skip_verify:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=3600)
    tail = (r.stdout + r.stderr)[-3000:]
    if r.returncode != 0:
        print("VERIFY FAILED:\n", tail); sys.exit(1)

con = duckdb.connect()
# Scaled-dir compares (sf10: 60M lineitem / 500k docs) push the heavy text
# oracles past RAM without a spill path — DuckDB then dies with a bad_alloc
# (observed on bigram_logprob at sf10, r15). Give it an explicit disk spill
# directory and a memory ceiling below the box total so it spills instead
# of aborting; both are harmless at gate scale.
_tmp = OUT / "duck_tmp"
_tmp.mkdir(parents=True, exist_ok=True)
con.sql(f"SET temp_directory='{_tmp}'")
con.sql(f"SET memory_limit='{os.environ.get('DUCK_MEM', '96GB')}'")
if os.environ.get("DUCK_THREADS"):
    con.sql(f"SET threads={int(os.environ['DUCK_THREADS'])}")
for t in TABLES:
    path = f"{SF}/{t}.parquet"
    src = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracles = json.loads((OUT / "oracle_sql.json").read_text())

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 9)
    if isinstance(v, bytes): return v.hex()
    return v

def canon(rows, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))

fails = []
record = {}


def rec(name, rows_match=False, schema_match=False, hash_match=False,
        spark_rows=None, oracle_rows=None, err=None):
    record[name] = {"rows_match": rows_match, "schema_match": schema_match,
                    "hash_match": hash_match, "spark_rows": spark_rows,
                    "oracle_rows": oracle_rows, "err": err}


for name in sorted(set(list(oracles.keys())) | {p.name for p in OUT.iterdir()
                                                if p.is_dir() and p.name != "duck_tmp"}):
    d = OUT / name
    if not d.is_dir():
        print(f"MISSING-RESULT {name} (query did not write output)"); fails.append(name)
        rec(name, err="missing result"); continue
    tbl = pq.read_table(d)
    snames = tbl.column_names
    cols = [c.to_pylist() for c in tbl.columns]
    srows = list(zip(*cols)) if cols else []
    if name not in oracles:
        print(f"NO-ORACLE    {name}: rows={tbl.num_rows} (rows-only check)"); continue
    try:
        res = con.sql(oracles[name])
        dnames = res.columns
        # Type lint: DuckDB silently widens (window SUM(BIGINT) -> HUGEINT,
        # AVG of DECIMAL stays DECIMAL) into types Spark never writes; the
        # driver's hasher then serializes them differently even when every
        # value matches. Forbid any output column whose type Spark can't
        # round-trip — the oracle SQL must CAST these explicitly.
        bad_types = [(n, str(t)) for n, t in zip(dnames, res.types)
                     if any(x in str(t).upper() for x in
                            ("HUGEINT", "DECIMAL", "UBIGINT", "UINTEGER",
                             "USMALLINT", "UTINYINT"))]
        if bad_types:
            print(f"TYPE-LINT    {name}: non-Spark-representable oracle output "
                  f"columns {bad_types} — add explicit CASTs in the oracle SQL")
            fails.append(name); rec(name, err=f"type lint: {bad_types}"); continue
        drows = res.fetchall()
    except Exception as e:
        print(f"ORACLE-ERR   {name}: {str(e).splitlines()[0][:160]}"); fails.append(name)
        rec(name, err=str(e).splitlines()[0][:200]); continue
    if sorted(snames) != sorted(dnames):
        print(f"SCHEMA-MISM  {name}: spark={sorted(snames)} duck={sorted(dnames)}"); fails.append(name)
        rec(name, spark_rows=len(srows), oracle_rows=len(drows)); continue
    if len(srows) != len(drows):
        print(f"ROWS-MISM    {name}: spark={len(srows)} duck={len(drows)}"); fails.append(name)
        rec(name, schema_match=True, spark_rows=len(srows), oracle_rows=len(drows)); continue
    cs, cd = canon(srows, snames), canon(drows, dnames)
    if cs != cd:
        bad = next(i for i, (a, b) in enumerate(zip(cs, cd)) if a != b)
        print(f"VALUE-MISM   {name}: first diff row {bad}:\n  spark={cs[bad]}\n  duck ={cd[bad]}")
        fails.append(name)
        rec(name, rows_match=True, schema_match=True,
            spark_rows=len(srows), oracle_rows=len(drows)); continue
    print(f"OK           {name}: rows={len(srows)}")
    rec(name, rows_match=True, schema_match=True, hash_match=True,
        spark_rows=len(srows), oracle_rows=len(drows))

if JSON_OUT:
    Path(JSON_OUT).write_text(json.dumps(record, indent=2, sort_keys=True))
    print(f"wrote {JSON_OUT}")
print(f"\n{'FAIL' if fails else 'PASS'}: {len(oracles) - len(fails)}/{len(oracles)} oracle-checked queries match", f"failures: {fails}" if fails else "")
sys.exit(1 if fails else 0)
