#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
graft.Verify, run its oracle SQL in DuckDB and compare rows/schema/hash
(columns sorted by name, rows stringified + sorted — the driver's compare).

Usage: tools/check_oracles.py [verify_out_dir]
(run `sbt -batch "runMain graft.Verify <sfDir> <out>"` first)
"""
import duckdb, json, glob, os, sys, hashlib

out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
sf = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
oracle = json.load(open(f'{out}/oracle_sql.json'))

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    scols = [cols[i] for i in order]
    srows = sorted(str(tuple(str(r[i]) for i in order)) for r in rows)
    h = hashlib.md5('\n'.join(srows).encode()).hexdigest()
    return scols, len(srows), h

con = duckdb.connect()
for p in glob.glob(f'{sf}/*.parquet'):
    tbl = os.path.basename(p).replace('.parquet', '')
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{p}')")
fails = []
for name in sorted(os.listdir(out)):
    d = f'{out}/{name}'
    if not os.path.isdir(d) or name.startswith('aux_'):
        continue
    if name not in oracle:
        print(f'{name:32s} NO ORACLE')
        continue
    sc, sn, sh = canon(*(lambda t: (t.columns, t.fetchall()))(
        con.query(f"SELECT * FROM read_parquet('{d}/*.parquet')")))
    try:
        t = con.query(oracle[name])
        oc, on, oh = canon(t.columns, t.fetchall())
    except Exception as e:
        print(f'{name:32s} ORACLE ERROR: {e}')
        fails.append(name)
        continue
    ok = (sc == oc) and (sn == on) and (sh == oh)
    if not ok:
        fails.append(name)
        print(f'{name:32s} MISMATCH cols={sc==oc} rows={sn}/{on} hash={sh==oh}')
    else:
        print(f'{name:32s} ok ({sn} rows)')
# an oracle whose dump is missing means the Spark query FAILED in Verify —
# never let that pass silently
for name in sorted(oracle):
    if not os.path.isdir(f'{out}/{name}'):
        print(f'{name:32s} DUMP MISSING (query failed in Verify?)')
        fails.append(name)
print(f'\n{"ALL PASS" if not fails else "FAILED: " + ", ".join(fails)}')
sys.exit(1 if fails else 0)
