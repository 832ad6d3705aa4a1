#!/usr/bin/env python3
"""Machine gate for the r15 t23 failure class: DuckDB converts HUGEINT
(and UHUGEINT) to float64 on the pandas/arrow fetch path (arrow has no
int128), so an oracle that emits a bare integer SUM (HUGEINT) hashes as
`61.0` against Spark's int64 `61` on a dtype/str-sensitive comparer —
the exact r12-r14 t23_bm25_topk signature (rows+schema match, hash
doesn't, local fetchall()-based mirror passes). DESCRIBE every oracle
query (type-level, planning only, data-independent) and fail if any
EMITTED column is HUGEINT/UHUGEINT — emitted integers must be cast to
BIGINT.

Usage: oracle_types.py SFDIR OUTDIR   (OUTDIR holds oracle_sql.json)
"""
import json, os, sys
import duckdb

BAD = {"HUGEINT", "UHUGEINT", "INT128", "UINT128"}

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_bad = 0
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE SELECT * FROM ({oracle[name]})").fetchall()
        except Exception as e:
            print(f"FAIL {name}: describe error: {e}")
            n_bad += 1
            continue
        bad = [(c, ty) for c, ty, *_ in desc if ty.upper() in BAD]
        if bad:
            print(f"FAIL {name}: pandas-lossy emitted columns {bad} — cast to BIGINT")
            n_bad += 1
    print(f"== {len(oracle)} oracles, {n_bad} with pandas-lossy output types")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
