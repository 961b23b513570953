#!/usr/bin/env python3
"""sf1 spot-verification of emitted LSH near-dup pairs (builder tooling).

The full DuckDB d02 oracle is infeasible at sf1: its unrolled
200-permutation minhash restatement materializes ~20B intermediate rows
(the r13 attempt exceeded a 48GB memory cap and spilled past 60GB before
being stopped). What IS cheap at any scale is verifying every pair the
ENGINE emitted: recompute the exact shingle-hash Jaccard in DuckDB for
just the docs appearing in emitted pairs (same rolling-hash chain as the
sf0.01 oracle, which pins the full pipeline bit-for-bit at that scale)
and check (a) the reported jaccard_e6 matches exactly and (b) every pair
meets the 4/5 threshold. Soundness of every emitted pair at scale;
completeness at scale is covered by the prefilter A/B
(graft.tools.LshPrefilterAb) plus the full sf0.01 oracle.

Usage: sf1_pair_spotcheck.py SF_DIR DUMP_DIR [query_name]
"""
import glob, sys
import duckdb

sf_dir, dump_dir = sys.argv[1], sys.argv[2]
name = sys.argv[3] if len(sys.argv) > 3 else "d02_minhash_lsh"

con = duckdb.connect()
con.execute("SET memory_limit='24GB'")
files = sorted(glob.glob(f"{dump_dir}/{name}/*.parquet"))
if not files:
    print(f"{name}: NO SPARK OUTPUT"); sys.exit(1)
con.execute(f"CREATE VIEW pairs AS SELECT * FROM read_parquet({files!r})")
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")

# d44's rows carry (est_e6, jaccard_e6, err_e6): verify the exact side
# like d02's and the err arithmetic |est - exact| in the same pass.
has_est = name.startswith("d44")
est_checks = (",\n       count(*) FILTER (WHERE err_e6 <> abs(est_e6 - jaccard_e6))"
              " AS err_mismatch" if has_est else "")
threshold_check = ("count(*) FILTER (WHERE FALSE)" if has_est else
                   "count(*) FILTER (WHERE i * 5 < u * 4)")

bad = con.execute(f"""
WITH ids AS (SELECT DISTINCT doc_a AS id FROM pairs
             UNION SELECT DISTINCT doc_b FROM pairs),
sh AS MATERIALIZED (
  SELECT doc_id,
         list_distinct([substring(text, i, 3)
                        for i in range(1, greatest(length(text)-2, 0)+1)]) AS s
  FROM documents WHERE doc_id IN (SELECT id FROM ids)),
h AS MATERIALIZED (
  SELECT doc_id,
         list_distinct([list_reduce([ascii(g[k]) for k in range(1, length(g)+1)],
           (a,c) -> (CAST(a AS BIGINT)*31+c) % 1000000007) for g in s]) AS hs
  FROM sh),
v AS (
  SELECT p.*,
         len(list_intersect(ha.hs, hb.hs)) AS i,
         len(list_distinct(ha.hs || hb.hs)) AS u
  FROM pairs p
  JOIN h ha ON ha.doc_id = p.doc_a
  JOIN h hb ON hb.doc_id = p.doc_b)
SELECT count(*) FILTER (WHERE jaccard_e6 <> (i * 1000000) // u) AS score_mismatch,
       {threshold_check} AS below_threshold,
       count(*) AS n_pairs{est_checks}
FROM v""").fetchone()

score_mismatch, below_threshold, n_pairs = bad[0], bad[1], bad[2]
err_mismatch = bad[3] if has_est else 0
status = ("OK" if score_mismatch == 0 and below_threshold == 0
          and err_mismatch == 0 else "FAIL")
print(f"{name}: {status} pairs={n_pairs} score_mismatch={score_mismatch} "
      f"below_threshold={below_threshold}"
      + (f" err_mismatch={err_mismatch}" if has_est else "")
      + f" sf={sf_dir}")
sys.exit(0 if status == "OK" else 1)
