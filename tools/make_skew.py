#!/usr/bin/env python3
"""Generate the SKEWED twin of the /tmp/sf1 trend dataset.

The uniform sf1 replicas (make_sf1.py) scale every key uniformly, so
they cannot see the defect class real 100 TB corpora carry: Zipf skew.
This tool emits the SAME row counts as make_sf1.py at the same factor,
but reshapes four key distributions into hot-key form (the shapes the
reference's own fixtures exhibit — CM-Well's /meta/ns and geonames
trees hold thousands of children under one parent,
server/cmwell-it/src/it/scala/cmwell/it/SearchTests.scala):

  - hot customer:  ~30% of orders point their o_custkey (and therefore
                   the refCustomer quad edge) at customer 1 — skews the
                   xg/yg/gqp traversals, SPARQL BGP joins, and the
                   quads refCustomer partition's object distribution.
  - hot supplier:  ~20% of lineitems point l_suppkey at supplier 1 —
                   skews the 2-hop order→lineitem→supplier chains.
  - hot user:      ~20% of events belong to user 1 — one /user path
                   owns 20% of all versions (current-flag window,
                   merge rewrite) and one session/funnel/retention
                   group holds 20% of the event stream.
  - hot shingle:   a fixed 12-token phrase prepended to ~10% of
                   documents AFTER replica prefixing (corpus-wide hot
                   n-grams with document frequency ~n/10) — attacks
                   the jaccard/containment prefix filters and the
                   substring/spans gram indexes.

Everything else (dims, embeddings, row counts, replica machinery) is
make_sf1.py verbatim, so skew-vs-uniform per-query ratios at equal
rows isolate the DISTRIBUTION variable. Deterministic, seedless.

Usage: python3 tools/make_skew.py [outdir=/tmp/sf1skew] [factor=10]
"""
import sys, os
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1skew"
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 10
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.sql("SET threads TO 16")

B_CUST, B_ORD, B_SUPP, B_PART = 100_000, 1_000_000, 10_000, 100_000
B_EVT, B_USER, B_DOC, B_VEC = 1_000_000, 100_000, 10_000, 10_000

HOT_PHRASE = ("common boilerplate header inserted by the portal "
              "template engine every single render pass")


def R(n=None):
    return (f"(SELECT unnest(generate_series(0, {FACTOR - 1})) AS r)")


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
  FROM '{SRC}/customer.parquet', {R()}""")

emit("supplier", f"""
  SELECT s_suppkey + r * {B_SUPP} AS s_suppkey,
         s_name || CASE WHEN r = 0 THEN '' ELSE '_r' || r END AS s_name,
         s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet', {R()}""")

emit("part", f"""
  SELECT p_partkey + r * {B_PART} AS p_partkey,
         p_name, p_brand, p_type, p_size, p_retailprice
  FROM '{SRC}/part.parquet', {R()}""")

# hot customer: o_orderkey % 10 < 3 (30% of EVERY replica's orders,
# deterministic in the shifted key) all point at global customer 1.
emit("orders", f"""
  SELECT o_orderkey + r * {B_ORD} AS o_orderkey,
         CASE WHEN (o_orderkey + r * {B_ORD}) % 10 < 3 THEN 1
              ELSE o_custkey + r * {B_CUST} END AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet', {R()}""")

# hot supplier: 20% of lineitems from global supplier 1.
emit("lineitem", f"""
  SELECT l_orderkey + r * {B_ORD} AS l_orderkey,
         l_partkey + r * {B_PART} AS l_partkey,
         CASE WHEN (l_orderkey + r * {B_ORD}) % 5 = 0 THEN 1
              ELSE l_suppkey + r * {B_SUPP} END AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet', {R()}""")

# hot user: event_id % 5 = 0 (20% of every replica's events) owned by
# global user 1 — /user/1 then carries 20% of ALL versions.
emit("events", f"""
  SELECT event_id + r * {B_EVT} AS event_id, ts,
         CASE WHEN (event_id + r * {B_EVT}) % 5 = 0 THEN 1
              ELSE user_id + r * {B_USER} END AS user_id,
         event_type, value, props
  FROM '{SRC}/events.parquet', {R()}""")

# replica token-prefixing exactly as make_sf1.py (linear near-dup
# structure), THEN the hot phrase on doc_id % 10 = 0 in the SHIFTED id
# space — identical across replicas, so its shingles reach corpus-wide
# document frequency ~n/10.
emit("documents", f"""
  WITH rep AS (
    SELECT doc_id + r * {B_DOC} AS doc_id,
           CASE WHEN r = 0 THEN text
                ELSE array_to_string(
                  list_transform(str_split(text, ' '),
                                 t -> 'r' || r || t), ' ') END AS text,
           lang, source, n_chars, r
    FROM '{SRC}/documents.parquet', {R()})
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0
              THEN '{HOT_PHRASE} ' || text ELSE text END AS text,
         lang, source,
         (length(text) + CASE WHEN doc_id % 10 = 0
                              THEN {len(HOT_PHRASE) + 1} ELSE 0 END)
           AS n_chars
  FROM rep""")

# HOT PREDICATE (round-16, VERDICT r15 task #5): the dynamic-fields
# twin of make_sf1.py's GRAFT_XNODES emission. SAME node count and
# SAME total entries per node as the uniform shape, but 95% of every
# node's values sit under ONE predicate 'hotp' (the rdf:type shape:
# one predicate owning the store's largest quad partition by a wide
# margin), the rest under singleton predicates from the same pool.
# Values keep the uniform customer-ref formula, so ONLY the predicate
# distribution differs between twins. Opt-in via GRAFT_XNODES like the
# uniform generator.
XN = int(os.environ.get("GRAFT_XNODES", "0"))
if XN:
    B_XNODE = 10_000
    HOT = (XN * 95) // 100
    n_cust = B_CUST * FACTOR
    emit("xnodes", f"""
      SELECT xid,
             map_from_entries(
               [struct_pack(
                  k := 'hotp',
                  v := list_transform(generate_series(0, {HOT - 1}),
                    i -> '/customer/' || ((xid * {XN} + i) % {n_cust})))]
               || list_transform(generate_series({HOT}, {XN - 1}),
                    i -> struct_pack(
                      k := 'p' || lpad(i::VARCHAR, 3, '0'),
                      v := ['/customer/' ||
                            ((xid * {XN} + i) % {n_cust})])))
               AS fields
      FROM (SELECT unnest(generate_series(0, {B_XNODE * FACTOR - 1}))
            AS xid)""")

emit("embeddings", f"""
  SELECT vec_id + r * {B_VEC} AS vec_id,
         list_transform(generate_series(1, len(embedding)),
           i -> (CASE WHEN r = 0 THEN 1
                 WHEN hash(r * 64 + i) % 2 = 0 THEN 1 ELSE -1 END)
                * embedding[1 + ((i - 1 + r) % len(embedding))]) AS embedding,
         label
  FROM '{SRC}/embeddings.parquet', {R()}""")
