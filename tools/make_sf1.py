#!/usr/bin/env python3
"""Regenerate the 10x sf1 trend dataset at /tmp/sf1 from sf0.1.

The driver ships sf0.001/0.01/0.1 only; the committed sf-trend profile
(bench_sf1.json) runs the same declared queries at 10x rows. Recipe
(documented in STATUS.md round-7/10 history; the original throwaway
script lived in /tmp and did not survive the container):

- facts key-shift x10 (customer/orders/lineitem/supplier/part), with
  foreign keys shifted consistently so referential structure scales
  linearly; dims (region/nation) and events stay 1x... events scale
  10x too via user_id/event_id shift (round-8 extension).
- documents: replicas token-prefixed ("r<k> " prepended) so near-dup
  structure scales LINEARLY - verbatim copies would explode pair
  counts quadratically and measure data pathology, not plans.
- embeddings: per-replica cyclic rotation of the vector (norms and
  intra-replica dot products preserved -> ANN structure scales
  linearly, no verbatim-copy tie pathology); vec_id shift.

Deterministic, seedless (pure arithmetic on the source rows).
Usage: python3 tools/make_sf1.py [outdir=/tmp/sf1]
"""
import sys, os
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.sql("SET threads TO 16")

# key-shift bases: clean powers of ten above each source key range
B_CUST, B_ORD, B_SUPP, B_PART = 100_000, 1_000_000, 10_000, 100_000
B_EVT, B_USER, B_DOC, B_VEC = 1_000_000, 100_000, 10_000, 10_000

R = "(SELECT unnest(generate_series(0, 9)) AS r)"

def emit(name, sql):
    con.sql(f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n}")

for t in ("region", "nation"):
    emit(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

emit("customer", f"""
  SELECT c_custkey + r * {B_CUST} AS c_custkey,
         c_name || CASE WHEN r = 0 THEN '' ELSE '_r' || r END AS c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet', {R}""")

emit("supplier", f"""
  SELECT s_suppkey + r * {B_SUPP} AS s_suppkey,
         s_name || CASE WHEN r = 0 THEN '' ELSE '_r' || r END AS s_name,
         s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet', {R}""")

emit("part", f"""
  SELECT p_partkey + r * {B_PART} AS p_partkey,
         p_name, p_brand, p_type, p_size, p_retailprice
  FROM '{SRC}/part.parquet', {R}""")

emit("orders", f"""
  SELECT o_orderkey + r * {B_ORD} AS o_orderkey,
         o_custkey + r * {B_CUST} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet', {R}""")

emit("lineitem", f"""
  SELECT l_orderkey + r * {B_ORD} AS l_orderkey,
         l_partkey + r * {B_PART} AS l_partkey,
         l_suppkey + r * {B_SUPP} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet', {R}""")

emit("events", f"""
  SELECT event_id + r * {B_EVT} AS event_id, ts,
         user_id + r * {B_USER} AS user_id,
         event_type, value, props
  FROM '{SRC}/events.parquet', {R}""")

# EVERY token gets the replica prefix (not just a leading marker):
# a single prepended token leaves replicas ~94% shingle-Jaccard
# similar, so each source doc's 10 replicas form a near-dup CLIQUE
# and candidate-pair counts grow ~100x — quadratic data pathology,
# not engine scaling. Prefixing every token destroys cross-replica
# shingle overlap entirely while preserving the within-replica
# near-dup structure verbatim (A ~ B at sf0.1 => A_r ~ B_r at each
# r) — the pair set and cluster sizes scale exactly 10x linear.
emit("documents", f"""
  SELECT doc_id + r * {B_DOC} AS doc_id,
         CASE WHEN r = 0 THEN text
              ELSE array_to_string(
                list_transform(str_split(text, ' '),
                               t -> 'r' || r || t), ' ') END AS text,
         lang, source,
         CASE WHEN r = 0 THEN n_chars
              ELSE n_chars + (length(str_split(text, ' '))
                              * length('r' || r)) END AS n_chars
  FROM '{SRC}/documents.parquet', {R}""")

# cyclic rotation by r positions: element i of replica r is source
# element (i + r) mod dim
emit("embeddings", f"""
  SELECT vec_id + r * {B_VEC} AS vec_id,
         list_transform(generate_series(1, len(embedding)),
           i -> embedding[1 + ((i - 1 + r) % len(embedding))]) AS embedding,
         label
  FROM '{SRC}/embeddings.parquet', {R}""")
