#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query parquet
dumped by `graft.Verify`, run its oracle SQL in DuckDB over the same
testdata tables and compare (schema-sorted, row-sorted, value-hashed).

Usage: check_oracles.py <verify_out_dir> <sf_dir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

def canon(rows, cols):
    cols = sorted(cols)
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = f"{v:.6g}"
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(t).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for qname, sql in sorted(oracle.items()):
        pdir = f"{outdir}/{qname}"
        if not os.path.isdir(pdir):
            print(f"[MISS] {qname}: no parquet output"); n_bad += 1; continue
        files = glob.glob(f"{pdir}/*.parquet")
        tbl = pq.read_table(files[0]) if len(files) == 1 else pq.read_table(pdir)
        got_rows = tbl.to_pylist()
        got_cols = tbl.column_names
        try:
            res = con.execute(sql)
            want_cols = [d[0] for d in res.description]
            want_rows = [dict(zip(want_cols, r)) for r in res.fetchall()]
        except Exception as e:
            print(f"[ERR ] {qname}: oracle SQL failed: {e}"); n_bad += 1; continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"[COLS] {qname}: spark={sorted(got_cols)} duck={sorted(want_cols)}")
            n_bad += 1; continue
        g, w = canon(got_rows, got_cols), canon(want_rows, want_cols)
        if g == w:
            print(f"[OK  ] {qname}: {len(g)} rows"); n_ok += 1
        else:
            print(f"[DIFF] {qname}: {len(g)} vs {len(w)} rows")
            for a, b in list(zip(g, w))[:3]:
                if a != b:
                    print(f"    spark: {a[:160]}\n    duck : {b[:160]}")
            if len(g) != len(w):
                only_g = set(g) - set(w)
                only_w = set(w) - set(g)
                for x in list(only_g)[:2]: print(f"    only-spark: {x[:160]}")
                for x in list(only_w)[:2]: print(f"    only-duck : {x[:160]}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
