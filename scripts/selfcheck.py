#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: python3 scripts/selfcheck.py <sfDir> <outDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each parquet result in <outDir> with an entry in oracle_sql.json:
run the SQL in DuckDB against the same fixture tables, canonicalize both
sides (sort columns by name, sort rows, round doubles to 1e-9 relative,
UTC timestamps), and diff.
"""
import json, math, sys, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        # 1e-9 relative rounding
        mag = 10 ** (9 - int(math.floor(math.log10(abs(v)))))
        return repr(round(v * mag) / mag)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canon_table(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def load_spark_result(path):
    tbl = pq.read_table(path)
    cols = tbl.column_names
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    return cols, rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(d))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        try:
            scols, srows = load_spark_result(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            ok = len(srows) > 0
            print(f"{'rows-only PASS' if ok else 'rows-only EMPTY'} {name}: {len(srows)} rows")
            n_rowsonly += 1
            if not ok:
                n_fail += 1
            continue
        try:
            res = con.execute(oracle[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sc, sr = canon_table(scols, srows)
        oc, orr = canon_table(ocols, orows)
        if [c.lower() for c in sc] != [c.lower() for c in oc]:
            print(f"FAIL {name}: schema mismatch spark={sc} duck={oc}")
            n_fail += 1
            continue
        if sr == orr:
            print(f"PASS {name}: {len(sr)} rows")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(orr)}")
            sset, oset = set(sr), set(orr)
            for r in list(sset - oset)[:3]:
                print(f"   spark-only: {r}")
            for r in list(oset - sset)[:3]:
                print(f"   duck-only:  {r}")
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
