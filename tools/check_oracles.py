#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query parquet
dumped by `graft.Verify`, run its oracle SQL in DuckDB over the same
testdata tables and compare (schema-sorted, row-sorted, TYPED values).

Hardened after round 3: the old canon() stringified every value (floats to
6 sig figs), so DuckDB HUGEINT vs Spark BIGINT and double bit-drift were
invisible locally while the driver gate hashed typed values and failed.
This version compares Arrow-level type classes (decimal != int) and raw
doubles bit-for-bit. Run `check_oracles.py --selftest` to prove the gate
catches a planted HUGEINT mismatch and a planted 1-ulp double drift.

Usage: check_oracles.py <verify_out_dir> <sf_dir>
       check_oracles.py --selftest
"""
import sys, json, glob, os, struct, datetime
from decimal import Decimal
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def type_class(t):
    """Normalized type signature. Width-tolerant for ints (the driver
    accepts int32-vs-int64 greens) but decimal/hugeint is NOT an int and
    float32 is not float64."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_float64(t):
        return "f64"
    if pa.types.is_float32(t):
        return "f32"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_class(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{t.field(i).name}:{type_class(t.field(i).type)}"
                         for i in range(t.num_fields))
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{type_class(t.key_type)},{type_class(t.item_type)}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def canon_val(v):
    """Typed canonical form. Crucially: Decimal(5) must NOT collide with
    int 5 (python hashes equal numerics equal), and doubles are compared
    on their IEEE bits, not a rounded repr."""
    if v is None:
        return ("0null",)  # tuple, and sorts before every typed tag
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        return ("d", struct.pack(">d", v).hex())
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (list, tuple)):
        return ("L",) + tuple(canon_val(x) for x in v)
    if isinstance(v, dict):
        return ("S",) + tuple((k, canon_val(v[k])) for k in sorted(v))
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return ("ts", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("by", bytes(v).hex())
    return ("s", str(v))


def canon_rows(tbl):
    cols = sorted(tbl.column_names)
    rows = tbl.to_pylist()
    return sorted(tuple(canon_val(r[c]) for c in cols) for r in rows)


def compare(qname, got_tbl, want_tbl, report=print):
    """Compare a Spark result (arrow table) to a DuckDB result (arrow
    table): names, type classes, typed values. Returns True if green."""
    got_cols, want_cols = sorted(got_tbl.column_names), sorted(want_tbl.column_names)
    if got_cols != want_cols:
        report(f"[COLS] {qname}: spark={got_cols} duck={want_cols}")
        return False
    # The driver's comparator row-sorts via pandas, which cannot hash
    # ndarray cells — ANY top-level array/struct/map column errors there
    # (round-4 lesson: emb_mean_pool/pq_codebook/pq_codes). Model that
    # limitation here instead of silently out-powering the driver gate:
    # driver-facing queries must emit scalar-grain columns (posexplode).
    unsortable = [c for t in (got_tbl, want_tbl) for c in t.column_names
                  if any(f(t.schema.field(c).type) for f in
                         (pa.types.is_list, pa.types.is_large_list,
                          pa.types.is_struct, pa.types.is_map))]
    if unsortable:
        report(f"[ARRY] {qname}: driver-unsortable array/struct columns "
               f"{sorted(set(unsortable))} — emit scalar grain (posexplode)")
        return False
    tmis = []
    for c in got_cols:
        gt = type_class(got_tbl.schema.field(c).type)
        wt = type_class(want_tbl.schema.field(c).type)
        if gt != wt:
            tmis.append(f"{c}: spark={gt} duck={wt}")
    if tmis:
        report(f"[TYPE] {qname}: " + "; ".join(tmis))
        return False
    g, w = canon_rows(got_tbl), canon_rows(want_tbl)
    if g == w:
        report(f"[OK  ] {qname}: {len(g)} rows")
        return True
    report(f"[DIFF] {qname}: {len(g)} vs {len(w)} rows")
    for a, b in list(zip(g, w))[:3]:
        if a != b:
            report(f"    spark: {str(a)[:160]}\n    duck : {str(b)[:160]}")
    if len(g) != len(w):
        only_g, only_w = set(g) - set(w), set(w) - set(g)
        for x in list(only_g)[:2]: report(f"    only-spark: {str(x)[:160]}")
        for x in list(only_w)[:2]: report(f"    only-duck : {str(x)[:160]}")
    return False


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
        got_tbl = pq.read_table(files[0]) if len(files) == 1 else pq.read_table(pdir)
        try:
            want_tbl = con.execute(sql).arrow()
        except Exception as e:
            print(f"[ERR ] {qname}: oracle SQL failed: {e}"); n_bad += 1; continue
        if compare(qname, got_tbl, want_tbl):
            n_ok += 1
        else:
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0


def selftest():
    """The checker must itself fail on exactly the classes of mismatch the
    round-3 driver gate caught and the old canon() missed."""
    con = duckdb.connect()
    fails = []

    def expect(name, got_sql_or_tbl, want_sql, should_pass):
        got = con.execute(got_sql_or_tbl).arrow() \
            if isinstance(got_sql_or_tbl, str) else got_sql_or_tbl
        want = con.execute(want_sql).arrow()
        res = compare(name, got, want, report=lambda *_: None)
        status = "ok" if res == should_pass else "FAIL"
        print(f"[{status:4}] selftest {name}: green={res} expected={should_pass}")
        if res != should_pass:
            fails.append(name)

    # 1. HUGEINT (decimal) vs BIGINT with equal numeric values must go RED.
    expect("hugeint_vs_bigint",
           "SELECT CAST(42 AS BIGINT) AS s",
           "SELECT sum(x) AS s FROM (VALUES (40), (2)) t(x)",  # HUGEINT
           should_pass=False)
    # 2. Same typed values must stay GREEN.
    expect("bigint_green",
           "SELECT CAST(42 AS BIGINT) AS s",
           "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (40), (2)) t(x)",
           should_pass=True)
    # 3. 1-ulp double drift (invisible at 6 sig figs) must go RED.
    a, b = 0.1 + 0.2, 0.3  # differ in the last bit
    ta = pa.table({"v": pa.array([a], pa.float64())})
    expect("double_1ulp", ta, f"SELECT CAST({b!r} AS DOUBLE) AS v",
           should_pass=False)
    # 4. Bit-identical doubles stay GREEN.
    expect("double_green", ta, f"SELECT CAST({a!r} AS DOUBLE) AS v",
           should_pass=True)
    # 5. int32 vs int64 is driver-tolerated → GREEN (width-normalized).
    expect("int_width_green",
           "SELECT CAST(7 AS INT) AS k",
           "SELECT CAST(7 AS BIGINT) AS k",
           should_pass=True)
    # 6. Value mismatch with matching types must go RED.
    expect("value_red",
           "SELECT CAST(1 AS BIGINT) AS k",
           "SELECT CAST(2 AS BIGINT) AS k",
           should_pass=False)
    # 7. Array-valued columns must go RED even when identical: the
    #    driver's pandas row-sorter cannot hash ndarray cells, so a
    #    locally-"green" array oracle would still ERR at the driver
    #    (round-4 failure class: emb_mean_pool / pq_codebook / pq_codes).
    expect("array_column_red",
           "SELECT [1, 2, 3] AS v",
           "SELECT [1, 2, 3] AS v",
           should_pass=False)
    print(f"== selftest {'PASS' if not fails else 'FAIL: ' + ', '.join(fails)} ==")
    return 1 if fails else 0


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
