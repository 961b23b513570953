#!/usr/bin/env python3
"""Local pre-check mirroring the driver's correctness gate: run each oracle
SQL in DuckDB over the same parquet tables and compare (rows, schema-ish,
values) against the Verify output parquet. Usage:

    python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_tbl = pq.read_table(f"{out_dir}/{name}")
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        # column-name sets
        sc, dc = sorted(spark_tbl.column_names), sorted(duck.column_names)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1
            continue
        if spark_tbl.num_rows != duck.num_rows:
            print(f"FAIL {name}: rows spark={spark_tbl.num_rows} duck={duck.num_rows}")
            n_fail += 1
            continue
        srows = list(zip(*[spark_tbl.column(c).to_pylist() for c in sc]))
        drows = list(zip(*[duck.column(c).to_pylist() for c in sc]))
        mismatch = None
        for i, (a, b) in enumerate(zip(srows, drows)):
            na, nb = tuple(map(norm, a)), tuple(map(norm, b))
            if na != nb:
                mismatch = (i, na, nb)
                break
        if mismatch:
            i, a, b = mismatch
            print(f"FAIL {name}: row {i} spark={a} duck={b}")
            n_fail += 1
        else:
            # type-level sanity: warn (not fail) on arrow type differences
            st = {c: str(spark_tbl.schema.field(c).type) for c in sc}
            dt = {c: str(duck.schema.field(c).type) for c in sc}
            warn = {c: (st[c], dt[c]) for c in sc if st[c] != dt[c]}
            extra = f"  [type-diff {warn}]" if warn else ""
            print(f"PASS {name} ({spark_tbl.num_rows} rows){extra}")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
