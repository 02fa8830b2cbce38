#!/usr/bin/env python3
"""Local pre-check emulating the driver's DuckDB-oracle compare.

Dev-only tool (python/duckdb are driver-side); the shipped library is
pure Scala. Usage: python3 tools/compare.py <sfDir> <outDir>

For each query dumped by graft.Verify into <outDir>/<name>/ this runs
the matching oracle SQL from oracle_sql.json against DuckDB views over
<sfDir>/*.parquet, sorts columns by name and rows by all columns, and
diffs values exactly. Stricter than the driver can be — if this passes,
the hash compare passes.
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    def key(t):
        return tuple((v is None, str(v)) for v in t)
    return [c for c in sorted(out, key=key)], [cols[i] for i in order]


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return fa == fb
    return a == b or str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            ores = con.execute(sql)
            ocols = [c[0] for c in ores.description]
            orows = ores.fetchall()
            sres = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [c[0] for c in sres.description]
            srows = sres.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: cols oracle={sorted(ocols)} spark={sorted(scols)}")
            n_fail += 1
            continue
        oc, cols = canon(orows, ocols)
        sc, _ = canon(srows, scols)
        if len(oc) != len(sc):
            print(f"FAIL {name}: rows oracle={len(oc)} spark={len(sc)}")
            print(f"  oracle[:2]={oc[:2]}\n  spark[:2]={sc[:2]}")
            n_fail += 1
            continue
        bad = None
        for i, (ro, rs) in enumerate(zip(oc, sc)):
            if not all(eq(a, b) for a, b in zip(ro, rs)):
                bad = (i, ro, rs)
                break
        if bad:
            print(f"FAIL {name}: first diff at sorted-row {bad[0]} cols={cols}")
            print(f"  oracle={bad[1]}\n  spark ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(oc)} rows)")
            n_pass += 1
    declared = set()
    import os
    for e in os.listdir(out_dir):
        if os.path.isdir(os.path.join(out_dir, e)):
            declared.add(e)
    no_oracle = declared - set(oracle)
    if no_oracle:
        print(f"no-oracle (rows-only) queries: {sorted(no_oracle)}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
