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
- embeddings: per-replica cyclic rotation PLUS a deterministic
  Rademacher sign pattern (norms and intra-replica dot products
  preserved exactly -> ANN structure scales linearly; signs keep
  replicas distinct past dim=64, so factor 100 has no verbatim-copy
  tie pathology); vec_id shift.

Deterministic, seedless (pure arithmetic on the source rows).
Usage: python3 tools/make_sf1.py [outdir=/tmp/sf1] [factor=10] [profile=all]
  factor 10  -> sf1  (the default trend set)
  factor 100 -> sf10 (the two-decade probe; see the FACTOR note below)
  profile    -> which tables take the full factor (the rest stay 10x):
    all   every table (needs ~100+ GB transient scratch at factor 100
          - the full-store ETL persists quads AND writes the layout)
    docs  documents/events/embeddings at FACTOR (consume, dedup,
          sessionize/as-of/overlap, stream families)
    facts customer/supplier/part/orders at FACTOR, lineitem stays 10x
          (xg/yg/gqp, SPARQL BGP, merge families; lineitem at 10x
          keeps referential integrity - its r<10 order keys are a
          subset of the 100x order key set)
"""
import sys, os
import duckdb

# argv[4]: alternate source sf dir — the third-decade pillar probes
# replicate from sf0.01 so factor 1000 fits the sandbox disk (the ETL
# writes each table's data three times: path-major, indexTime-major,
# quads — events x1000 from sf0.1 would be a ~70 GB store).
SRC = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
# replica count: 10 = sf1 (the default trend set), 100 = sf10 (the
# two-decade probe of the scale-critical families). Key-shift bases
# are chosen so even 100 replicas stay collision-free (largest source
# key 600000 << the 1M order base x 100).
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 10
PROFILE = sys.argv[3] if len(sys.argv) > 3 else "all"
assert PROFILE in ("all", "docs", "facts", "events", "documents",
                   "embeddings"), PROFILE
DOC_TABLES = {"documents", "events", "embeddings"}
FACT_TABLES = {"customer", "supplier", "part", "orders"}
# single-table profiles for the THIRD-decade (factor 1000 = sf100)
# probe: the sandbox disk can't hold a full sf100 store (the ETL
# writes the events/docs data three times — path-major, indexTime-
# major, quads), but ONE pillar at 1000x with the rest at 10x fits.
# "events" feeds the consume/export family, "documents" exact dedup.
SOLO = {"events": {"events"}, "documents": {"documents"},
        "embeddings": {"embeddings"}}
def factor_of(table):
    if PROFILE == "all":
        return FACTOR
    full = (DOC_TABLES if PROFILE == "docs"
            else FACT_TABLES if PROFILE == "facts"
            else SOLO[PROFILE])
    return FACTOR if table in full else 10
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.sql("SET threads TO 16")

# key-shift bases: clean powers of ten above each source key range
B_CUST, B_ORD, B_SUPP, B_PART = 100_000, 1_000_000, 10_000, 100_000
B_EVT, B_USER, B_DOC, B_VEC = 1_000_000, 100_000, 10_000, 10_000

# Embedding replicas: rotation by r mod dim PLUS a per-replica
# deterministic Rademacher sign pattern, bit 0 of duckdb's hash(r*64+i)
# (a real-avalanche mix — polynomial bit picks all failed here: r vs
# r+64 differences are structurally even multiples of 64, so any fixed
# bit of a polynomial in (r, i) is blind to the +64 shift). The signs
# square away inside any intra-replica dot product, so planted
# near-dup pairs replicate EXACTLY (dots and norms preserved — ANN
# structure scales linearly), while cross-replica copies of one source
# vector decorrelate (measured max cross-replica cosine 0.68 over 100
# replicas; 50k/50k distinct vectors — no verbatim r vs r-64 tie at
# FACTOR > 64, the collision that used to force the sf10 probe to
# exclude the embedding family). r = 0 keeps the source rows verbatim.
def R(table):
    return f"(SELECT unnest(generate_series(0, {factor_of(table) - 1})) AS r)"

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
  FROM '{SRC}/customer.parquet', {R('customer')}""")

emit("supplier", f"""
  SELECT s_suppkey + r * {B_SUPP} AS s_suppkey,
         s_name || CASE WHEN r = 0 THEN '' ELSE '_r' || r END AS s_name,
         s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet', {R('supplier')}""")

emit("part", f"""
  SELECT p_partkey + r * {B_PART} AS p_partkey,
         p_name, p_brand, p_type, p_size, p_retailprice
  FROM '{SRC}/part.parquet', {R('part')}""")

emit("orders", f"""
  SELECT o_orderkey + r * {B_ORD} AS o_orderkey,
         o_custkey + r * {B_CUST} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet', {R('orders')}""")

emit("lineitem", f"""
  SELECT l_orderkey + r * {B_ORD} AS l_orderkey,
         l_partkey + r * {B_PART} AS l_partkey,
         l_suppkey + r * {B_SUPP} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet', {R('lineitem')}""")

emit("events", f"""
  SELECT event_id + r * {B_EVT} AS event_id, ts,
         user_id + r * {B_USER} AS user_id,
         event_type, value, props
  FROM '{SRC}/events.parquet', {R('events')}""")

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
  FROM '{SRC}/documents.parquet', {R('documents')}""")

# OPT-IN dynamic-fields table (GRAFT_XNODES=<values per node>, off by
# default so the committed trend/decade recipes are byte-identical):
# xnodes.parquet (xid, fields MAP<VARCHAR, VARCHAR[]>) loads as
# /xnode/<xid> infotons whose predicates come from the data
# (TableLoader's open-vocabulary path). The UNIFORM shape: every node
# carries XN distinct predicates p000..p<XN-1>, one customer-reference
# value each — XN*nodes quads spread evenly over XN predicates. The
# skew twin (make_skew.py) emits the SAME entry count per node but
# concentrates 95% under ONE predicate (the rdf:type hot-predicate
# shape), so skew-vs-uniform isolates the predicate distribution at
# equal quad counts.
XN = int(os.environ.get("GRAFT_XNODES", "0"))
if XN:
    B_XNODE = 10_000
    n_cust = B_CUST * factor_of("customer")
    emit("xnodes", f"""
      SELECT xid,
             map_from_entries(list_transform(generate_series(0, {XN - 1}),
               i -> struct_pack(
                 k := 'p' || lpad(i::VARCHAR, 3, '0'),
                 v := ['/customer/' || ((xid * {XN} + i) % {n_cust})])))
               AS fields
      FROM (SELECT unnest(generate_series(0,
             {B_XNODE * factor_of('events') - 1})) AS xid)""")

# cyclic rotation by r positions: element i of replica r is source
# element (i + r) mod dim
emit("embeddings", f"""
  SELECT vec_id + r * {B_VEC} AS vec_id,
         list_transform(generate_series(1, len(embedding)),
           i -> (CASE WHEN r = 0 THEN 1
                 WHEN hash(r * 64 + i) % 2 = 0 THEN 1 ELSE -1 END)
                * embedding[1 + ((i - 1 + r) % len(embedding))]) AS embedding,
         label
  FROM '{SRC}/embeddings.parquet', {R('embeddings')}""")
