#!/usr/bin/env python3
"""Synthesize an sf1-equivalent testdata directory from sf0.1 (builder-side
tooling; NOT part of the library). The driver ships sf0.001/0.01/0.1 only,
so the one-off sf1 correctness + bench pass (VERDICT r7, ask #3) needs a
10x dataset with the same shape. Strategy: 10 sharded replicas with
consistent key shifts so referential integrity (orders->customer,
lineitem->orders/part/supplier, events.user_id) holds per shard and keys
stay globally unique:

  - dimensions (region, nation) copy 1x;
  - fact/key tables shift each key column by shard * span;
  - documents: shard 0 keeps the original text verbatim; shards >= 1 apply
    a per-shard PSEUDO-RANDOM CHARACTER PERMUTATION of [a-zA-Z0-9]
    (seeded by the shard id), with the oracle's quality-rule stopwords
    (the/a/of/and/to/in) preserved verbatim. A char bijection preserves
    WITHIN-shard character-n-gram similarity structure EXACTLY (the unit
    the MinHash/winnow/suffix operators measure), so each shard
    contributes the base corpus's near-dup pair mass — pair count grows
    LINEARLY with shards — while CROSS-shard char-gram overlap is ~only
    spaces/punct/stopwords (J ~ 0.1, far below every gate threshold).
    The r12 original of this script prefixed every TOKEN with 'k<shard>_',
    which preserved token-level structure but INFLATED char-3-gram Jaccard
    of the templated synthetic text: a large near-threshold pair mass
    crossed J=0.8 within every remapped shard (sf0.1: 256 verified pairs;
    old sf1: 5.5M), so the LSH-family scale probes measured the fixture's
    quadratic artifact, not the engine — the same defect class VERDICT r11
    ask #4 fixed for e19/d56. Stopword preservation also keeps the
    n_stop>=1 quality rule alive in every shard, so pipeline gates
    (d11/d45/d51) process the FULL corpus at sf1/sf10 instead of
    collapsing to shard 0 after stage 1;
  - embeddings: first vector component perturbed by shard * 1e-4 to break
    exact distance ties that identical copies would create.

Every oracle gate recomputes its expected answer in DuckDB over THESE
files, so the correctness compare is as meaningful at sf1 as at sf0.01.
"""
import sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata_sf1"
SHARDS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

import os
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def span(table, key):
    return con.sql(
        f"SELECT max({key}) + 1 FROM read_parquet('{SRC}/{table}.parquet')"
    ).fetchone()[0]

O = span("orders", "o_orderkey")
C = span("customer", "c_custkey")
P = span("part", "p_partkey")
S = span("supplier", "s_suppkey")
E = span("events", "event_id")
U = span("events", "user_id")
D = span("documents", "doc_id")
V = span("embeddings", "vec_id")

def gen(table, select):
    con.execute(f"""
      COPY (
        SELECT {select}
        FROM read_parquet('{SRC}/{table}.parquet') CROSS JOIN range({SHARDS}) k(k)
        ORDER BY k.k
      ) TO '{DST}/{table}.parquet' (FORMAT PARQUET)""")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")

for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied 1x")

gen("customer", f"""
  c_custkey + k.k * {C} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment""")
gen("orders", f"""
  o_orderkey + k.k * {O} AS o_orderkey, o_custkey + k.k * {C} AS o_custkey,
  o_orderstatus, o_totalprice, o_orderdate, o_orderpriority""")
gen("lineitem", f"""
  l_orderkey + k.k * {O} AS l_orderkey, l_partkey + k.k * {P} AS l_partkey,
  l_suppkey + k.k * {S} AS l_suppkey, l_linenumber, l_quantity,
  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate""")
gen("part", f"""
  p_partkey + k.k * {P} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice""")
gen("supplier", f"""
  s_suppkey + k.k * {S} AS s_suppkey, s_name, s_nationkey, s_acctbal""")
gen("events", f"""
  event_id + k.k * {E} AS event_id, ts, user_id + k.k * {U} AS user_id,
  event_type, value, props""")
import random
import string
ALPHABET = string.ascii_lowercase + string.ascii_uppercase + string.digits
def shard_dst(k):
    if k == 0:
        return ALPHABET
    chars = list(ALPHABET)
    random.Random(k).shuffle(chars)
    return "".join(chars)
shift_rows = ", ".join(f"({k}, '{shard_dst(k)}')" for k in range(SHARDS))
STOP = "('the','a','of','and','to','in')"
# char bijection preserves length and split/join on ' ' preserves spacing,
# so n_chars carries over verbatim for every shard.
con.execute(f"""
  COPY (
    SELECT doc_id + k.k * {D} AS doc_id,
      CASE WHEN k.k = 0 THEN text
           ELSE array_to_string(list_transform(string_split(text, ' '),
             x -> CASE WHEN x IN {STOP} THEN x
                  ELSE translate(x, '{ALPHABET}', sh.dst) END), ' ')
      END AS text,
      lang, source, n_chars
    FROM read_parquet('{SRC}/documents.parquet')
    CROSS JOIN range({SHARDS}) k(k)
    JOIN (VALUES {shift_rows}) sh(k, dst) ON sh.k = k.k
    ORDER BY k.k
  ) TO '{DST}/documents.parquet' (FORMAT PARQUET)""")
print("documents:", con.sql(
    f"SELECT count(*) FROM read_parquet('{DST}/documents.parquet')").fetchone()[0], "rows")
gen("embeddings", f"""
  vec_id + k.k * {V} AS vec_id,
  list_prepend(CAST(embedding[1] + k.k * 0.0001 AS FLOAT), embedding[2:]) AS embedding,
  label""")
print("done ->", DST)
