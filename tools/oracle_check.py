#!/usr/bin/env python3
"""Local stand-in for the driver's t2 compare: reads the graft.Verify output
dir (parquet per query + oracle_sql.json), runs each oracle SQL in DuckDB over
the same sf tables, and diffs canonicalized results.

Usage: python3 tools/oracle_check.py [sfDir] [verifyOut]
"""
import sys, os, json, glob
from decimal import Decimal
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(v):
    if v is None:
        return r"\N"
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)

def canon_result(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(",".join(canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], lines

def fragile_types(sql):
    """Driver-hash-fragile output columns: the driver canonicalizes decimals
    through a float conversion on one side, so DECIMAL/DOUBLE/FLOAT outputs
    hash-mismatch whenever str(Decimal) != repr(float(v)) (trailing zeros).
    Returns [(col, type), ...] for such columns."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [(r[0], r[1]) for r in rows
            if any(t in r[1].upper() for t in ("DECIMAL", "DOUBLE", "FLOAT", "REAL"))]

oracle_sql = json.load(open(f"{OUT}/oracle_sql.json"))
names = sorted(d for d in os.listdir(OUT) if os.path.isdir(f"{OUT}/{d}"))
ok, bad, noora = 0, [], []
# A query graft.Verify ATTEMPTED (attempted.json manifest) whose output dir is
# absent means it threw — surface as FAIL instead of silently shrinking the
# denominator. Partial runs (name-prefix filters) list only the subset they
# tried, so unattempted queries never false-fail. Older outputs without the
# manifest fall back to "flag only when the run looks complete".
try:
    attempted = json.load(open(f"{OUT}/attempted.json"))
except FileNotFoundError:
    attempted = list(oracle_sql) if names and len(names) > len(oracle_sql) * 0.5 else []
for q in attempted:
    if q in oracle_sql and q not in names:
        bad.append((q, "attempted but engine wrote no output (query threw?)"))
for name in names:
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        bad.append((name, "engine produced no parquet")); continue
    frag = fragile_types(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
    if frag and name in oracle_sql:
        bad.append((name, f"driver-fragile output types (decimal/double): {frag}")); continue
    cur = con.execute(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
    ecols = [d[0] for d in cur.description]; erows = cur.fetchall()
    if name not in oracle_sql:
        noora.append((name, len(erows))); continue
    try:
        cur = con.execute(oracle_sql[name])
        ocols = [d[0] for d in cur.description]; orows = cur.fetchall()
    except Exception as ex:
        bad.append((name, f"oracle error: {ex}")); continue
    ec, el = canon_result(ecols, erows)
    oc, ol = canon_result(ocols, orows)
    if ec != oc:
        bad.append((name, f"column mismatch: engine={ec} oracle={oc}")); continue
    if el != ol:
        diff = next((i, a, b) for i, (a, b) in enumerate(zip(el + ["<end>"], ol + ["<end>"])) if a != b)
        bad.append((name, f"rows engine={len(el)} oracle={len(ol)}; first diff @{diff[0]}:\n  E: {diff[1][:200]}\n  O: {diff[2][:200]}"))
        continue
    ok += 1
print(f"MATCH {ok}/{len(names)}  (rows-only: {len(noora)})")
for n, r in noora:
    print(f"  ROWS-ONLY {n}: {r} rows")
for n, msg in bad:
    print(f"  FAIL {n}: {msg}")
sys.exit(1 if bad else 0)
