#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify on a scale-factor dir, then replays each oracle SQL in
DuckDB over the same parquet tables and compares (column-name-sorted,
row-sorted, exact values). Dev tool only — the engine itself has no
Python/DuckDB dependency.

Usage: python3 scripts/check.py [sfdir] [outdir] [--skip-verify] [--only q1,q2]
"""
import json, math, subprocess, sys, glob, os

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else "/tmp/graft_verify"
ONLY = set()
for i, a in enumerate(sys.argv):
    if a == "--only" and i + 1 < len(sys.argv):
        ONLY = set(sys.argv[i + 1].split(","))
TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def run_verify():
    cp = "target/scala-2.13/classes:/opt/spark/jars/*"
    opens = [f"--add-opens={p}=ALL-UNNAMED" for p in
             ["java.base/java.lang","java.base/java.lang.invoke","java.base/java.lang.reflect",
              "java.base/java.io","java.base/java.net","java.base/java.nio","java.base/java.util",
              "java.base/java.util.concurrent","java.base/java.util.concurrent.atomic",
              "java.base/sun.nio.ch","java.base/sun.nio.cs","java.base/sun.security.action",
              "java.base/sun.util.calendar"]]
    env = dict(os.environ, SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS","8"))
    cmd = ["java","-Xmx8g",*opens,"-Dspark.ui.enabled=false",
           "-Dspark.sql.session.timeZone=UTC","-cp",cp,"graft.Verify",SF,OUT,*sorted(ONLY)]
    r = subprocess.run(cmd, cwd="/root/repo", env=env, capture_output=True, text=True)
    for line in r.stderr.splitlines():
        if "[verify]" in line or "Exception" in line: print(line)
    if r.returncode != 0:
        print(r.stderr[-3000:]); sys.exit(1)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float) and math.isnan(v): v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [cols[i] for i in order]

def main():
    if "--skip-verify" not in sys.argv: run_verify()
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if ONLY and name not in ONLY: continue
        pdir = f"{OUT}/{name}"
        if not glob.glob(f"{pdir}/*.parquet"):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{pdir}/*.parquet'")
            grows, gcols = canon(got.fetchall(), got.columns)
            exp = con.sql(sql)
            erows, ecols = canon(exp.fetchall(), exp.columns)
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}"); n_fail += 1; continue
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}"); n_fail += 1; continue
        # The driver's hasher is type-sensitive (e.g. DuckDB SUM(BIGINT) →
        # HUGEINT → arrow decimal128 vs Spark's int64): flag any result-type
        # divergence between the spark parquet and the oracle query even
        # when Python-level values compare equal.
        gtypes = {c: str(t) for c, t in zip(got.columns, got.types)}
        etypes = {c: str(t) for c, t in zip(exp.columns, exp.types)}
        tmism = {c: (gtypes[c], etypes[c]) for c in gtypes if gtypes[c] != etypes.get(c)}
        if tmism:
            print(f"FAIL {name}: result types differ {tmism}"); n_fail += 1; continue
        if grows == erows:
            print(f"PASS {name} ({len(grows)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: rows differ (spark {len(grows)} vs oracle {len(erows)})")
            for a, b in list(zip(grows, erows))[:200]:
                if a != b: print(f"  spark : {a}\n  oracle: {b}"); break
            only_g = [r for r in grows if r not in erows][:2]
            only_e = [r for r in erows if r not in grows][:2]
            if only_g: print(f"  spark-only : {only_g}")
            if only_e: print(f"  oracle-only: {only_e}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

main()
