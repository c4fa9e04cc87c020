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
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def coarse_duck(t):
    """Coarse type class of a DuckDB result column. The driver's hash is
    representation-sensitive, so an oracle column whose DuckDB type differs
    in class from the Spark parquet column WILL hash-mismatch even when the
    values are numerically equal (the r4 q76/q101/q111 bug: sum(BIGINT) is
    HUGEINT in DuckDB, and Python's fetchall() masks it via int conversion)."""
    t = str(t).upper()
    if t in ("HUGEINT", "UHUGEINT"):
        return "hugeint"   # never acceptable: Spark has no int128
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t == "VARCHAR":
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t.endswith("[]") or t.startswith(("LIST", "STRUCT", "MAP", "ARRAY")):
        return "nested"
    return t.lower()


def coarse_arrow(t):
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "ts"
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_struct(t) or pa.types.is_map(t)):
        return "nested"
    return str(t)


def type_mismatches(spark_schema, duck_cols, duck_types):
    """Column-name-aligned coarse-type diff; returns a list of problems."""
    duck = {c.lower(): coarse_duck(t) for c, t in zip(duck_cols, duck_types)}
    problems = []
    for field in spark_schema:
        d = duck.get(field.name.lower())
        s = coarse_arrow(field.type)
        if d == "hugeint":
            problems.append(f"{field.name}: DuckDB HUGEINT (wrap the oracle "
                            f"aggregate in CAST(... AS BIGINT))")
        elif d is not None and d != s:
            problems.append(f"{field.name}: spark={s} duck={d}")
    spark_names = {f.name.lower() for f in spark_schema}
    for c, t in zip(duck_cols, duck_types):
        if coarse_duck(t) == "hugeint" and c.lower() not in spark_names:
            problems.append(f"{c}: DuckDB HUGEINT")
    return problems


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
            rel = con.sql(oracle[name])
            ocols = list(rel.columns)
            otypes = [str(t) for t in rel.types]
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # type seam guard: the driver's hash is representation-sensitive, so
        # a class-level type drift (esp. HUGEINT) is a fail even if values
        # compare equal after Python's int conversion
        parts = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not parts:
            print(f"FAIL {name}: no parquet part files in {out_dir}/{name}")
            n_fail += 1
            continue
        spark_schema = pq.read_schema(parts[0])
        tprob = type_mismatches(spark_schema, ocols, otypes)
        if tprob:
            print(f"FAIL {name}: oracle/result type drift: {'; '.join(tprob)}")
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
