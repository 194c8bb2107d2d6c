#!/usr/bin/env python3
"""Scalable stand-in for check.py at big scale factors: instead of
fetching rows into Python, both sides (engine parquet, oracle SQL)
canonicalize INSIDE DuckDB (ints -> BIGINT, floats -> round 6 with -0
squashed, temporals/containers -> text) and compare (count, SUM(row
hash)) — an order-independent multiset fingerprint. Usage:
check_hash.py OUTDIR SFDIR"""
import duckdb, json, sys, os, glob

outdir, sfdir = sys.argv[1], sys.argv[2]
# optional: --skip=a,b (oracle infeasible at this scale — reported, not
# counted as failure), --only=a,b (restrict the pass)
skip, only = set(), None
for arg in sys.argv[3:]:
    if arg.startswith("--skip="): skip = set(arg[7:].split(","))
    if arg.startswith("--only="): only = set(arg[7:].split(","))
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):  # Spark-written table directory
        p = f"{p}/*.parquet"
    if glob.glob(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon_expr(name, typ):
    t = typ.upper()
    q = f'"{name}"'
    if "[" in t or "STRUCT" in t or "MAP" in t:
        return f"to_json({q})::VARCHAR"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return f"CAST({q} AS BIGINT)"
    if t in ("DOUBLE", "FLOAT", "REAL") or t.startswith("DECIMAL"):
        # round-6-decimals, but capped at 9 SIGNIFICANT digits: a sum of
        # 1M doubles legitimately differs across engines in the ~1e-10
        # relative tail, and 6 decimals on a 1e11-magnitude value would
        # demand 17 significant digits of agreement
        return (f"(CASE WHEN {q} IS NULL THEN NULL WHEN {q} = 0 THEN 0.0 "
                f"ELSE round(CAST({q} AS DOUBLE), CAST(least(6, "
                f"8 - floor(log10(abs(CAST({q} AS DOUBLE))))) AS INTEGER)) "
                f"+ 0.0 END)")
    if "TIMESTAMP" in t or t == "DATE" or "TIME" in t:
        return f"CAST({q} AS VARCHAR)"
    return q

def fingerprint(sql_src):
    desc = con.execute(f"DESCRIBE SELECT * FROM ({sql_src})").fetchall()
    cols = sorted((r[0], r[1]) for r in desc)
    exprs = ", ".join(canon_expr(n, t) + f' AS "{n}"' for n, t in cols)
    pack = ", ".join(f'c{i} := "{n}"' for i, (n, _) in enumerate(cols))
    row = con.execute(
        f"SELECT count(*), sum(hash(struct_pack({pack}))) FROM "
        f"(SELECT {exprs} FROM ({sql_src}))").fetchone()
    return [r[0] for r in desc], row

fails = 0
qlist = f"{outdir}/queries.json"
present = {n for n in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, n))}
if os.path.exists(qlist):
    for name in json.load(open(qlist)):
        if name not in present:
            print(f"{name}: MISSING OUTPUT (query crashed)"); fails += 1
for name in sorted(present):
    if only is not None and name not in only: continue
    if name in skip:
        print(f"{name}: SKIPPED (oracle infeasible at this scale)"); continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO OUTPUT"); fails += 1; continue
    src = f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"
    rcols, (rn, rh) = fingerprint(src)
    if name not in oracle:
        print(f"{name}: rows-only, {rn} rows " + ("OK" if rn else "EMPTY!"))
        if not rn: fails += 1
        continue
    try:
        ocols, (on, oh) = fingerprint(oracle[name])
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}"); fails += 1; continue
    if sorted(rcols) != sorted(ocols):
        print(f"{name}: SCHEMA MISMATCH spark={sorted(rcols)} oracle={sorted(ocols)}")
        fails += 1; continue
    if rn == on and rh == oh:
        print(f"{name}: OK ({rn} rows)")
    else:
        print(f"{name}: MISMATCH rows {rn} vs {on}, hash {rh} vs {oh}")
        fails += 1
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
