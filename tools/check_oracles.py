#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
given SF, then execute each oracle SQL in DuckDB over the same parquet
fixtures and compare (rows, schema-width, and values with columns sorted by
name, rows sorted by all columns). Usage:

    python3 tools/check_oracles.py [sfdir] [outdir] [--no-run] [only_query ...]
"""
import json, math, subprocess, sys, pathlib

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
rest = sys.argv[3:]
run_verify = "--no-run" not in rest
only = [a for a in rest if not a.startswith("--")]

if run_verify:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
        capture_output=True, text=True, cwd="/root/repo")
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        sys.exit(1)

import duckdb
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if pathlib.Path(p).exists():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"): return v.isoformat()
    if isinstance(v, (bytes, bytearray)): return v.hex()
    if isinstance(v, list): return tuple(norm(x) for x in v)
    return v

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

fails = 0
names = only or sorted(oracle.keys())
if not only:
    # Completeness gate: every oracle key must have a produced output dir —
    # round 6's gate passed by omission when 18 queries crashed in Verify.
    produced = {p.name for p in pathlib.Path(outdir).iterdir() if p.is_dir()}
    extra = produced - set(oracle)
    if extra:
        print(f"NOTE: outputs without oracle entries: {sorted(extra)}")
for name in names:
    sql = oracle.get(name)
    pq = f"{outdir}/{name}"
    if not pathlib.Path(pq).exists():
        print(f"FAIL {name}: no spark output at {pq}")
        fails += 1
        continue
    if pathlib.Path(f"{pq}/_FAILED").exists():
        msg = pathlib.Path(f"{pq}/_FAILED").read_text().strip()
        print(f"FAIL {name}: verify marked failed: {msg[:200]}")
        fails += 1
        continue
    try:
        s = con.execute(f"SELECT * FROM '{pq}/*.parquet'")
        scols, srows = s.description, s.fetchall()
        o = con.execute(sql)
        ocols, orows = o.description, o.fetchall()
        # The driver hashes values after an arrow/pandas materialization,
        # where DuckDB HUGEINT/DECIMAL become decimal128/float64 and no
        # longer hash-equal to Spark's int64 even when the Python ints match
        # (bit us in r02's q_simhash). Flag any non-primitive arrow type.
        # LIMIT 0 wrapper: schema only — don't execute the full oracle twice
        # (the recursive-CTE cluster oracles are the gate's slowest queries).
        osch = con.execute(f"SELECT * FROM ({sql}) LIMIT 0").arrow().schema
        bad = [f"{f.name}:{f.type}" for f in osch
               if str(f.type).startswith(("decimal", "uint64"))]
        if bad:
            print(f"FAIL {name}: oracle emits driver-unsafe types {bad} "
                  f"(cast to BIGINT/DOUBLE in the oracle SQL)")
            fails += 1
            continue
    except Exception as e:
        print(f"FAIL {name}: exec error: {e}")
        fails += 1
        continue
    scn, srn = canon([c[0] for c in scols], srows)
    ocn, orn = canon([c[0] for c in ocols], orows)
    if scn != ocn:
        print(f"FAIL {name}: schema {scn} vs oracle {ocn}")
        fails += 1
    elif len(srn) != len(orn):
        print(f"FAIL {name}: rows {len(srn)} vs oracle {len(orn)}")
        fails += 1
    elif srn != orn:
        diff = [(a, b) for a, b in zip(srn, orn) if a != b][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {diff}")
        fails += 1
    else:
        print(f"PASS {name} ({len(srn)} rows)")
print(f"{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'} / {len(names)} queries")
sys.exit(1 if fails else 0)
