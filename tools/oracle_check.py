#!/usr/bin/env python3
"""Local replica of the driver's correctness compare: for each query name,
read the Spark parquet dump and run the DuckDB oracle SQL over the same sf
tables; compare row count, column names, and a sorted-by-column-name value
hash."""
import sys, json, glob
import duckdb, pandas as pd
import hashlib

args = [a for a in sys.argv[1:] if a != "--selftest"]
selftest = "--selftest" in sys.argv
sf_dir, out_dir = args[0], args[1]
names = args[2].split(",") if len(args) > 2 else None

oracle = json.load(open(f"{out_dir}/oracle_sql.json")) if not selftest else {}
con = duckdb.connect()
# Scale passes (sf1 LSH oracles): the exact-Jaccard restatements
# materialize large intermediate lists — cap memory so DuckDB spills to
# disk instead of thrashing the box, and give it a spill directory.
import os as _os
con.execute(f"SET memory_limit='{_os.environ.get('ORACLE_MEM', '48GB')}'")
con.execute("SET temp_directory='/tmp/duckdb_spill'")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    except Exception:
        pass

# Lossy-type guard (the d48 bug class, cost rounds 9-10): DuckDB types an
# uncast integer SUM as HUGEINT, which its pandas bridge silently widens to
# float64 — the driver compare then hash-mismatches a value-identical result.
# Every oracle's output schema is DESCRIBEd and any type the bridge cannot
# carry losslessly into the compare is a hard failure for that query, BEFORE
# any rows are compared, so the bug class trips at authoring time.
LOSSY_TYPES = {"HUGEINT", "UHUGEINT"}

def lossy_cols(sql):
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:
        # A non-describable oracle still runs below; the compare surfaces
        # its real error — don't double-report here.
        print(f"  (describe unavailable: {e})")
        return []
    return [(row[0], row[1]) for row in desc
            if row[1].upper().split("(")[0] in LOSSY_TYPES]

if selftest:
    # A deliberately-uncast integer SUM must trip the guard; its CAST
    # sibling must pass. Exit nonzero if either expectation fails.
    tripped = lossy_cols("SELECT SUM(o_orderkey) AS s FROM orders")
    clean = lossy_cols("SELECT CAST(SUM(o_orderkey) AS BIGINT) AS s FROM orders")
    if tripped and not clean:
        print(f"SELFTEST OK: uncast SUM typed {tripped[0][1]} and tripped; cast passed")
        sys.exit(0)
    print(f"SELFTEST FAILED: tripped={tripped} clean={clean}")
    sys.exit(1)

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # Canonicalize date-typed columns: Spark parquet DATE loads as python
    # date objects, DuckDB DATE as datetime64 — both render as ISO dates.
    # (SparkEntry's output conventions forbid raw timestamps, so any
    # datetime column here is a date.)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.strftime("%Y-%m-%d")
        elif df[c].dtype == object and df[c].map(
                lambda x: hasattr(x, "isoformat") or x is None).all() \
                and df[c].notna().any():
            df[c] = df[c].map(lambda x: None if x is None else x.isoformat()[:10])
    return df

def h(df):
    s = df.to_csv(index=False, float_format="%.9g")
    return hashlib.md5(s.encode()).hexdigest()

ok = bad = 0
for name, sql in sorted(oracle.items()):
    if names and name not in names:
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); bad += 1; continue
    lossy = lossy_cols(sql)
    if lossy:
        print(f"{name}: LOSSY ORACLE TYPE {lossy} — cast the aggregate to "
              "BIGINT in the oracle SQL (DuckDB's pandas bridge widens "
              "HUGEINT to float64 and the hash compare false-fails)")
        bad += 1
        continue
    try:
        # sorted(files) + ignore_index: a query whose output spans >1 part
        # file must not hash in arbitrary glob order or carry per-file
        # indexes into the compare.
        spark_df = norm(pd.concat(
            [pd.read_parquet(f) for f in sorted(files)], ignore_index=True))
        ora_df = norm(con.execute(sql).df())
    except Exception as e:
        print(f"{name}: ERROR {e}"); bad += 1; continue
    rows = len(spark_df) == len(ora_df)
    cols = list(spark_df.columns) == list(ora_df.columns)
    # Align numeric representations without masking real value drift:
    # int-vs-int unifies to int64; float on either side compares both as
    # float64 (rendered %.9g below, so 2 vs 2.7 still differs). Never cast
    # a float oracle down to the Spark int dtype — that would truncate a
    # genuine mismatch into a pass.
    for c in spark_df.columns.intersection(ora_df.columns):
        s, o = spark_df[c], ora_df[c]
        if pd.api.types.is_numeric_dtype(s) and pd.api.types.is_numeric_dtype(o):
            if pd.api.types.is_integer_dtype(s) and pd.api.types.is_integer_dtype(o):
                spark_df[c] = s.astype("int64")
                ora_df[c] = o.astype("int64")
            else:
                spark_df[c] = s.astype("float64")
                ora_df[c] = o.astype("float64")
        elif pd.api.types.is_bool_dtype(s) or pd.api.types.is_bool_dtype(o):
            spark_df[c] = s.astype("bool")
            ora_df[c] = o.astype("bool")
    if rows and cols:
        # Row order across part files is not meaningful — sort both frames
        # on all columns before hashing so a multi-file dump can't false-FAIL.
        key = list(spark_df.columns)
        spark_df = spark_df.sort_values(key, ignore_index=True)
        ora_df = ora_df.sort_values(key, ignore_index=True)
    hm = rows and cols and h(spark_df) == h(ora_df)
    if rows and cols and hm:
        ok += 1
    else:
        bad += 1
        print(f"{name}: rows={rows}({len(spark_df)}/{len(ora_df)}) cols={cols} hash={hm}")
        if not cols:
            print("  spark:", list(spark_df.columns), "\n  ora:  ", list(ora_df.columns))
        if rows and cols and not hm:
            try:  # diagnostic only — never abort the remaining compares
                merged = spark_df.compare(ora_df)
                if not merged.empty:
                    print(merged.head(5))
            except Exception as e:
                print(f"  (diff diagnostic unavailable: {e})")
print(f"OK={ok} BAD={bad}")
sys.exit(1 if bad else 0)
