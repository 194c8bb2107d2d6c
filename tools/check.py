#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify output
parquet vs DuckDB oracle on the same sf dir. Usage: check.py OUTDIR SFDIR"""
import duckdb, json, sys, glob, os, math

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0: v = 0.0
            if isinstance(v, list):
                v = tuple(v)
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out

fails = 0
# Authoritative query list: any registered query with no output directory is
# a failure (it crashed before writing parquet) — without this, a crashed
# query silently vanishes from the report.
qlist = f"{outdir}/queries.json"
if os.path.exists(qlist):
    present = {n for n in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, n))}
    for name in json.load(open(qlist)):
        if name not in present:
            print(f"{name}: MISSING OUTPUT (query crashed)"); fails += 1
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d): continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"{name}: NO OUTPUT"); fails += 1; continue
    res = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')")
    rrows, rcols = res.fetchall(), [c[0] for c in res.description]
    if name not in oracle:
        print(f"{name}: rows-only check, {len(rrows)} rows " + ("OK" if rrows else "EMPTY!"))
        if not rrows: fails += 1
        continue
    o = con.execute(oracle[name])
    orows, ocols = o.fetchall(), [c[0] for c in o.description]
    if sorted(rcols) != sorted(ocols):
        print(f"{name}: SCHEMA MISMATCH spark={sorted(rcols)} oracle={sorted(ocols)}"); fails += 1; continue
    a, b = canon(rrows, rcols), canon(orows, ocols)
    if a == b:
        print(f"{name}: OK ({len(a)} rows)")
    else:
        fails += 1
        print(f"{name}: MISMATCH spark_rows={len(a)} oracle_rows={len(b)}")
        sa, sb = set(a), set(b)
        for x in list(sa - sb)[:3]: print("  spark-only:", x)
        for x in list(sb - sa)[:3]: print("  oracle-only:", x)
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
