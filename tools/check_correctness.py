#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query output
parquet under OUTDIR, run the corresponding oracle SQL in DuckDB over the
same sf tables, sort columns by name + rows by value, and compare cells
exactly. Usage: check_correctness.py SFDIR OUTDIR [query ...]"""
import json, math, os, sys
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

def cell_eq(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b
        try:
            return float(a) == float(b)
        except (TypeError, ValueError):
            return False
    return a == b

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        g_cols = [c[0] for c in got.description]
        g_rows = got.fetchall()
        try:
            exp = con.execute(oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        e_cols = [c[0] for c in exp.description]
        e_rows = exp.fetchall()
        gc, gr = canon(g_rows, g_cols)
        ec, er = canon(e_rows, e_cols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs {ec}")
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} vs {len(er)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, er)):
            for j, (x, y) in enumerate(zip(a, b)):
                if not cell_eq(x, y):
                    bad = (i, gc[j], x, y)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
            n_fail += 1
            continue
        # Fetch-path dtype check (the r15 t23 lesson): the driver's
        # comparer goes through pandas/arrow, where e.g. a DuckDB
        # HUGEINT becomes float64 while Spark's int64 stays integral —
        # values equal under fetchall() but '61.0' != '61' under a
        # str/dtype-sensitive hash. Compare the pandas dtype KIND
        # (integer/float/other) per column on LIMIT 0 of both sides.
        try:
            gdt = con.execute(
                f"SELECT * FROM read_parquet('{d}/*.parquet') LIMIT 0").df().dtypes
            edt = con.execute(f"SELECT * FROM ({oracle[name]}) LIMIT 0").df().dtypes
            kinds = {}
            for c in gdt.index:
                a, b = gdt[c].kind, edt[c].kind
                ak = "int" if a in "iu" else ("float" if a == "f" else "other")
                bk = "int" if b in "iu" else ("float" if b == "f" else "other")
                if ak != bk:
                    kinds[c] = (ak, bk)
            if kinds:
                print(f"FAIL {name}: pandas fetch-path dtype mismatch {kinds}")
                n_fail += 1
                continue
        except Exception:
            pass  # LIMIT-0 pushdown quirks never fail the gate by themselves
        print(f"PASS {name} ({len(gr)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
