package graft

import graft.model.GraftStore
import graft.ops.{Graph, Search}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared queries for graph traversal (SURVEY.md §2.3): xg / yg /
  * gqp over the FK reference edges of the loaded store. */
object GraphQueries {

  private def st(s: SparkSession, dir: String): GraftStore =
    GraftStore.forDir(s, dir)

  private def pathsOf(df: DataFrame): DataFrame = {
    // the traversal result is a broadcast semi-join over the store scan
    // (shuffle-free), so the global sort's range-sampling pass would
    // re-run that scan — persistForSort (result-sized, within-query)
    // makes it run once; see [[graft.ops.Caches.persistForSort]]
    val p = graft.ops.Caches.persistForSort(
      df.select(col("system.path").as("path")))
    p.orderBy("path")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // xg one hop: urgent expensive orders + their customers
    "q_xg" -> ((s, dir) => {
      val store = st(s, dir)
      val base = Search.run(store, Search.Request(path = "/orders",
        qp = Some("orderpriority::1-URGENT,totalprice>95000")))
      pathsOf(Graph.xg(store, base, Graph.parseXg("refCustomer", Graph.refFields(store))))
    }),

    // xg two-level chain: max-quantity lineitems -> orders -> customers
    "q_xg_2level" -> ((s, dir) => {
      val store = st(s, dir)
      val base = Search.run(store, Search.Request(path = "/lineitem",
        qp = Some("quantity>49.5")))
      pathsOf(Graph.xg(store, base,
        Graph.parseXg("refOrders>refCustomer", Graph.refFields(store))))
    }),

    // yg incoming hop with per-hop filter: top BUILDING customers plus
    // the expensive orders that point at them (expandUp — the reversed
    // equi-join, wsutil/package.scala:617-714)
    "q_yg_in" -> ((s, dir) => {
      val store = st(s, dir)
      val base = Search.run(store, Search.Request(path = "/customer",
        qp = Some("mktsegment::BUILDING,acctbal>9900")))
      pathsOf(Graph.yg(store, base, "<refCustomer[totalprice>100000]"))
    }),

    // yg outgoing hop with per-hop filter (expandIn direction): rich
    // suppliers plus their nation, kept only when it is NATION_9
    "q_yg_out" -> ((s, dir) => {
      val store = st(s, dir)
      val base = Search.run(store, Search.Request(path = "/supplier",
        qp = Some("acctbal>9000")))
      pathsOf(Graph.yg(store, base, ">refNation[name::NATION_9]"))
    }),

    // yg `|`-separated alternative paths (Parsers.scala:493): each
    // alternative expands from the ORIGINAL base and the reached sets
    // union (wsutil/package.scala:905-913)
    "q_yg_multi" -> ((s, dir) => {
      val store = st(s, dir)
      val base = Search.run(store, Search.Request(path = "/customer",
        qp = Some("mktsegment::BUILDING,acctbal>9900")))
      pathsOf(Graph.yg(store, base,
        "<refCustomer[totalprice>100000]|>refNation[name::NATION_9]"))
    }),

    // yg per-hop comma field list (repsep(filteredFieldExact, ","),
    // Parsers.scala:485-486): one level fanning out over two reference
    // fields, each with its own filter — ONE shared predicate-pruned
    // edge scan per (direction, filter) group
    "q_yg_fieldlist" -> ((s, dir) => {
      val store = st(s, dir)
      val base = Search.run(store, Search.Request(path = "/lineitem",
        qp = Some("quantity>49.5")))
      pathsOf(Graph.yg(store, base,
        ">refOrders[orderpriority::1-URGENT],refPart[retailprice>2000]"))
    }),

    // gqp: pure existence filter — customers having any order over 200k
    // (LEFT SEMI JOIN chain, never adds infotons)
    "q_gqp" -> ((s, dir) => {
      val store = st(s, dir)
      val base = Search.run(store, Search.Request(path = "/customer"))
      pathsOf(Graph.gqp(store, base, "<refCustomer[totalprice>200000]"))
    }),

    // gqp two-hop chain: suppliers with a max-quantity lineitem whose
    // order is 1-URGENT (supplier <- lineitem -> order)
    "q_gqp_2hop" -> ((s, dir) => {
      val store = st(s, dir)
      val base = Search.run(store, Search.Request(path = "/supplier"))
      pathsOf(Graph.gqp(store, base,
        "<refSupplier[quantity>49]>refOrders[orderpriority::1-URGENT]"))
    }),

    // gqp `|` alternatives: keep customers satisfying EITHER chain —
    // a 400k order exists, or their nation is NATION_9
    "q_gqp_multi" -> ((s, dir) => {
      val store = st(s, dir)
      val base = Search.run(store, Search.Request(path = "/customer"))
      pathsOf(Graph.gqp(store, base,
        "<refCustomer[totalprice>400000]|>refNation[name::NATION_9]"))
    }),

    // xg per-level comma field list (filteredFields, Parsers.scala:381):
    // max-quantity lineitems expanded over refOrders AND refPart in one
    // level — a single two-predicate pruned edge scan
    "q_xg_fieldlist" -> ((s, dir) => {
      val store = st(s, dir)
      val base = Search.run(store, Search.Request(path = "/lineitem",
        qp = Some("quantity>49.5")))
      pathsOf(Graph.xg(store, base,
        Graph.parseXg("refOrders,refPart", Graph.refFields(store))))
    }),

    // xg digit joker WITH filter (`jokers = digit ~ filter.?`,
    // Parsers.scala:441-445): one wildcard level over every reference
    // field, keeping only NATION_9 targets
    "q_xg_joker_filtered" -> ((s, dir) => {
      val store = st(s, dir)
      val base = Search.run(store, Search.Request(path = "/customer",
        qp = Some("mktsegment::AUTOMOBILE")))
      pathsOf(Graph.xg(store, base,
        Graph.parseXg("1[name::NATION_9]", Graph.refFields(store))))
    }),

    // xg ns-wildcard field (`*.prefix`, nsWildcardPattern
    // Parsers.scala:370-375): one level over every field CLAIMED under
    // the ont namespace — only refNation edges leave /customer, so the
    // expansion reaches the MACHINERY customers' nations
    "q_xg_nswild" -> ((s, dir) => {
      val store = st(s, dir)
      val base = Search.run(store, Search.Request(path = "/customer",
        qp = Some("mktsegment::MACHINERY")))
      pathsOf(Graph.xg(store, base,
        Graph.parseXg("*.ont", Graph.refFields(store))))
    }),

    // xg ns-wildcard, full-URI spelling (`$nsUri#*$`, uriPattern
    // Parsers.scala:362-364): same claimed-key expansion addressed by
    // namespace IRI instead of prefix — FURNITURE customers' nations
    "q_xg_uriwild" -> ((s, dir) => {
      val store = st(s, dir)
      val base = Search.run(store, Search.Request(path = "/customer",
        qp = Some("mktsegment::FURNITURE")))
      pathsOf(Graph.xg(store, base, Graph.parseXg(
        "$" + graft.qp.Namespaces.DefaultNs + "*$", Graph.refFields(store))))
    }),

    // expansionLimit (webservice.xg.limit): a 10-infoton cap on an
    // expansion that reaches thousands must abort — surfaced as a
    // boolean row so the abort semantics are oracle-checkable
    "q_expansion_limit" -> ((s, dir) => {
      val store = st(s, dir)
      val base = Search.run(store, Search.Request(path = "/orders"))
      val limited =
        try {
          Graph.xg(store, base,
            Graph.parseXg("refCustomer", Graph.refFields(store)),
            limit = Some(10)).count()
          false
        } catch { case _: IllegalStateException => true }
      s.range(1).select(lit(limited).as("limited"))
    }),

    // xg=_ wildcard: one hop over EVERY reference field in the store's
    // type dictionary (Parsers.scala:384-465 `_` form). Base = rich
    // BUILDING customers; only refNation edges leave /customer, so the
    // expansion reaches their nations.
    "q_xg_all" -> ((s, dir) => {
      val store = st(s, dir)
      val base = Search.run(store, Search.Request(path = "/customer",
        qp = Some("mktsegment::BUILDING,acctbal>9900")))
      pathsOf(Graph.xg(store, base, Graph.parseXg("_", Graph.refFields(store))))
    }),

    // xg with a per-level value filter (Parsers.scala:384-465): expand
    // BUILDING customers along refNation, keeping only NATION_9 targets
    "q_xg_filtered" -> ((s, dir) => {
      val store = st(s, dir)
      val base = Search.run(store, Search.Request(path = "/customer",
        qp = Some("mktsegment::BUILDING")))
      pathsOf(Graph.xg(store, base,
        Graph.parseXg("refNation[name::NATION_9]", Graph.refFields(store))))
    }),

    // Gremlin pipe chain (`_sp` Gremlin surface): reverse hop + typed
    // has-filter + property projection, compiled to frontier joins
    "q_gremlin" -> ((s, dir) =>
      graft.ops.Gremlin.eval(st(s, dir),
          """g.v("/nation/1").in("refNation").has("mktsegment", "BUILDING").values("name")""")
        .orderBy("value")),

    // Gremlin forward chain ending in ids — customer → nation → region
    "q_gremlin_out" -> ((s, dir) =>
      graft.ops.Gremlin.eval(st(s, dir),
          """g.v("/customer/1").out("refNation").out("refRegion").id""")
        .orderBy("id")),

    // Gremlin existence + typed range comparator (the qp-compiler
    // forms beyond equality): vertices carrying mktsegment (customers)
    // with acctbal > 9000 — numeric compare, not lexicographic
    "q_gremlin_range" -> ((s, dir) =>
      graft.ops.Gremlin.eval(st(s, dir),
          """g.V.has("mktsegment").has("acctbal", "gt", "9000").id""")
        .orderBy("id")),

    // Gremlin `.path` terminal: every result row carries its full
    // visited trail (rendered '>'-joined so it stays relational) —
    // rich BUILDING customers through their nation to its region
    "q_gremlin_path" -> ((s, dir) =>
      graft.ops.Gremlin.eval(st(s, dir),
          """g.V.has("mktsegment", "BUILDING").has("acctbal", "gt", "9900").out("refNation").out("refRegion").path""")
        .orderBy("path")),

    // Gremlin EDGE pipes (Blueprints outE + implicit edge-id terminal):
    // composite ids in the reference JenaEdge.getId format
    // `outV-label->inV` pin the edge frame's from/label/to fidelity
    "q_gremlin_edges" -> ((s, dir) =>
      graft.ops.Gremlin.eval(st(s, dir),
          """g.V.has("mktsegment", "BUILDING").has("acctbal", "gt", "9900").outE("refNation").id""")
        .orderBy("id")),

    // Gremlin BOUNDED loop: .loop("x", 2) desugars the wildcard in()
    // since .as("x") into two hop-join levels — region ← nations ←
    // {customers, suppliers} (closure loops fail loud; see Gremlin)
    "q_gremlin_loop" -> ((s, dir) =>
      graft.ops.Gremlin.eval(st(s, dir),
          """g.v("/region/1").as("x").in().loop("x", 2).id""")
        .orderBy("id")),

    // Gremlin as/back (BackFilterPipe): nations of region 1 that have
    // at least one rich BUILDING customer — the filter constrains two
    // hops downstream, .back rewinds the SURVIVORS to the named step
    "q_gremlin_back" -> ((s, dir) =>
      graft.ops.Gremlin.eval(st(s, dir),
          """g.v("/region/1").in("refRegion").as("n").in("refNation").has("mktsegment", "BUILDING").has("acctbal", "gt", "9000").back("n").id""")
        .orderBy("id")),

    // Gremlin groupCount (GroupCountPipe): how many BUILDING customers
    // reach each nation — hops preserve multiplicity (one path per
    // customer), unlike the deduping id-frontier evaluator
    "q_gremlin_groupcount" -> ((s, dir) =>
      graft.ops.Gremlin.eval(st(s, dir),
          """g.V.has("mktsegment", "BUILDING").out("refNation").groupCount""")
        .select(col("id"), col("n").cast("long").as("n"))
        .orderBy("id")),

    // Gremlin .order (OrderPipe): the ENGINE emits the sorted stream —
    // no .orderBy here; the oracle's ORDER BY pins that the pipe
    // itself produced id order end-to-end through the implicit
    // id terminal
    "q_gremlin_order" -> ((s, dir) =>
      graft.ops.Gremlin.eval(st(s, dir),
          """g.v("/region/1").in("refRegion").in("refNation").has("mktsegment", "BUILDING").has("acctbal", "gt", "9000").order""")),

    // Gremlin .filter{closure}, translatable subset: comparison
    // closures desugar onto the typed has-comparators (numeric >=
    // compares numbers; string == the keyword slot) — programmatic
    // closures still fail loud (they need the reference's Groovy
    // engine; see Gremlin.parseFilterClosure)
    "q_gremlin_filter" -> ((s, dir) =>
      graft.ops.Gremlin.eval(st(s, dir),
          """g.v("/nation/1").in("refNation").filter{it.acctbal >= 8000}.filter{it.mktsegment == "BUILDING"}.id""")
        .orderBy("id")),

    // Gremlin slashy-regex closures (the last mechanically-
    // translatable .filter{} form): `==~` full-match desugars to
    // anchored rlike on the string value slot, the parenthesized
    // Groovy negation `!(... =~ ...)` to NOT-find — both inside one
    // conjunctive closure, so the chain exercises the && split plus
    // both polarities. Programmatic closures still fail loud.
    "q_gremlin_regex" -> ((s, dir) =>
      graft.ops.Gremlin.eval(st(s, dir),
          """g.v("/nation/1").in("refNation").filter{it.name ==~ /Customer#0*\d*[02468]/ && !(it.mktsegment =~ /MACH/)}.id""")
        .orderBy("id")),

    // Gremlin .transform{...} pure-projection subset (TransformPipe):
    // it.prop desugars to the values pipe; the filter closure upstream
    // keeps the chain a real Gremlin-2 porting shape
    "q_gremlin_transform" -> ((s, dir) =>
      graft.ops.Gremlin.eval(st(s, dir),
          """g.v("/nation/1").in("refNation").filter{it.acctbal >= 8000}.transform{it.name}""")
        .orderBy("value")),

    // Gremlin .select (SelectPipe): project the .as-named steps as
    // columns — customer / nation / region triples for rich BUILDING
    // customers
    "q_gremlin_select" -> ((s, dir) =>
      graft.ops.Gremlin.eval(st(s, dir),
          """g.V.has("mktsegment", "BUILDING").has("acctbal", "gt", "9900").as("c").out("refNation").as("n").out("refRegion").as("r").select""")
        .orderBy("c")),

    // Gremlin .aggregate/.except (AggregatePipe + ExceptFilterPipe):
    // bag customer 1's home nation, expand to its region's nations,
    // drop the bag — the classic "neighbors except already-seen"
    // collect-and-filter idiom as one anti-join
    "q_gremlin_except" -> ((s, dir) =>
      graft.ops.Gremlin.eval(st(s, dir),
          """g.v("/customer/1").out("refNation").aggregate("home").out("refRegion").in("refRegion").except("home").id""")
        .orderBy("id")),

    // Gremlin .retain (RetainFilterPipe): bag the nations with a rich
    // BUILDING customer, expand through their regions to ALL sibling
    // nations, retain the bag — the semi-join dual of except
    "q_gremlin_retain" -> ((s, dir) =>
      graft.ops.Gremlin.eval(st(s, dir),
          """g.V.has("mktsegment", "BUILDING").has("acctbal", "gt", "9000").out("refNation").aggregate("rich").out("refRegion").in("refRegion").retain("rich").id""")
        .orderBy("id")),

    // Gremlin .except over a NAMED STEP (Gremlin 2's except(String...)
    // overload, per-path equality): customer 1's same-nation
    // neighborhood (nation → customers AND suppliers) minus the rows
    // whose head equals the vertex held at .as("x") — i.e. minus the
    // start itself. No bag exists, so this is non-vacuous only through
    // the named-step branch (the string-bag form would fail loud).
    "q_gremlin_except_step" -> ((s, dir) =>
      graft.ops.Gremlin.eval(st(s, dir),
          """g.v("/customer/1").as("x").out("refNation").in("refNation").except("x").id""")
        .orderBy("id")),

    // Gremlin .simplePath (SimplePathFilterPipe): two wildcard both()
    // hops from nation 1 — every there-and-back path (via its region,
    // customers or suppliers) revisits nation 1 and is dropped; the
    // survivors are sibling nations, customer orders and supplier
    // lineitems
    "q_gremlin_simplepath" -> ((s, dir) =>
      graft.ops.Gremlin.eval(st(s, dir),
          """g.v("/nation/1").both().both().simplePath.path""")
        .orderBy("path")))

  val oracles: Map[String, String] = Map(
    "q_expansion_limit" -> "SELECT TRUE AS limited",
    "q_gremlin" ->
      """SELECT c_name AS value FROM customer
        |WHERE c_nationkey = 1 AND c_mktsegment = 'BUILDING'
        |ORDER BY value""".stripMargin,
    "q_gremlin_out" ->
      """SELECT DISTINCT '/region/' || CAST(n_regionkey AS VARCHAR) AS id
        |FROM nation WHERE n_nationkey =
        |  (SELECT c_nationkey FROM customer WHERE c_custkey = 1)
        |ORDER BY id""".stripMargin,
    "q_gremlin_range" ->
      """SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS id
        |FROM customer WHERE c_acctbal > 9000
        |ORDER BY id""".stripMargin,
    "q_gremlin_filter" ->
      """SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS id
        |FROM customer WHERE c_nationkey = 1 AND c_acctbal >= 8000
        |AND c_mktsegment = 'BUILDING'
        |ORDER BY id""".stripMargin,
    "q_gremlin_regex" ->
      """SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS id
        |FROM customer WHERE c_nationkey = 1
        |AND regexp_full_match(c_name, 'Customer#0*\d*[02468]')
        |AND NOT regexp_matches(c_mktsegment, 'MACH')
        |ORDER BY id""".stripMargin,
    "q_gremlin_transform" ->
      """SELECT c_name AS value FROM customer
        |WHERE c_nationkey = 1 AND c_acctbal >= 8000
        |ORDER BY value""".stripMargin,
    "q_gremlin_edges" ->
      """SELECT '/customer/' || CAST(c_custkey AS VARCHAR) ||
        |  '-refNation->/nation/' || CAST(c_nationkey AS VARCHAR) AS id
        |FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9900
        |ORDER BY id""".stripMargin,
    "q_gremlin_loop" ->
      """SELECT id FROM (
        |  SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS id
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  WHERE n_regionkey = 1
        |  UNION
        |  SELECT '/supplier/' || CAST(s_suppkey AS VARCHAR)
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_regionkey = 1
        |) ORDER BY id""".stripMargin,
    "q_gremlin_back" ->
      """SELECT DISTINCT '/nation/' || CAST(n_nationkey AS VARCHAR) AS id
        |FROM nation JOIN customer ON c_nationkey = n_nationkey
        |WHERE n_regionkey = 1 AND c_mktsegment = 'BUILDING'
        |  AND c_acctbal > 9000
        |ORDER BY id""".stripMargin,
    "q_gremlin_path" ->
      """SELECT '/customer/' || CAST(c_custkey AS VARCHAR) ||
        |  '>/nation/' || CAST(c_nationkey AS VARCHAR) ||
        |  '>/region/' || CAST(n_regionkey AS VARCHAR) AS path
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9900
        |ORDER BY path""".stripMargin,
    "q_gremlin_groupcount" ->
      """SELECT '/nation/' || CAST(c_nationkey AS VARCHAR) AS id,
        |  count(*) AS n
        |FROM customer WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1 ORDER BY id""".stripMargin,
    "q_gremlin_order" ->
      """SELECT DISTINCT '/customer/' || CAST(c_custkey AS VARCHAR) AS id
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_regionkey = 1 AND c_mktsegment = 'BUILDING'
        |  AND c_acctbal > 9000
        |ORDER BY id""".stripMargin,
    "q_gremlin_select" ->
      """SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS c,
        |  '/nation/' || CAST(c_nationkey AS VARCHAR) AS n,
        |  '/region/' || CAST(n_regionkey AS VARCHAR) AS r
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9900
        |ORDER BY c""".stripMargin,
    "q_gremlin_except" ->
      """SELECT DISTINCT '/nation/' || CAST(n2.n_nationkey AS VARCHAR) AS id
        |FROM customer c
        |JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        |JOIN nation n2 ON n2.n_regionkey = n1.n_regionkey
        |WHERE c.c_custkey = 1 AND n2.n_nationkey <> n1.n_nationkey
        |ORDER BY id""".stripMargin,
    "q_gremlin_retain" ->
      """SELECT DISTINCT '/nation/' || CAST(c_nationkey AS VARCHAR) AS id
        |FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000
        |ORDER BY id""".stripMargin,
    "q_gremlin_except_step" ->
      """WITH nk AS (SELECT c_nationkey AS k FROM customer
        |  WHERE c_custkey = 1)
        |SELECT id FROM (
        |  SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS id
        |  FROM customer WHERE c_nationkey = (SELECT k FROM nk)
        |    AND c_custkey <> 1
        |  UNION
        |  SELECT '/supplier/' || CAST(s_suppkey AS VARCHAR) AS id
        |  FROM supplier WHERE s_nationkey = (SELECT k FROM nk))
        |ORDER BY id""".stripMargin,
    "q_gremlin_simplepath" ->
      """SELECT path FROM (
        |  SELECT '/nation/1>/region/' || CAST(n_regionkey AS VARCHAR) ||
        |    '>/nation/' || CAST(n_nationkey AS VARCHAR) AS path
        |  FROM nation
        |  WHERE n_regionkey =
        |    (SELECT n_regionkey FROM nation WHERE n_nationkey = 1)
        |    AND n_nationkey <> 1
        |  UNION
        |  SELECT '/nation/1>/customer/' || CAST(c_custkey AS VARCHAR) ||
        |    '>/orders/' || CAST(o_orderkey AS VARCHAR)
        |  FROM customer JOIN orders ON o_custkey = c_custkey
        |  WHERE c_nationkey = 1
        |  UNION
        |  SELECT '/nation/1>/supplier/' || CAST(s_suppkey AS VARCHAR) ||
        |    '>/lineitem/' || CAST(l_orderkey AS VARCHAR) || '-' ||
        |    CAST(l_linenumber AS VARCHAR) || '-' ||
        |    CAST(l_partkey AS VARCHAR) || '-' ||
        |    CAST(l_suppkey AS VARCHAR)
        |  FROM supplier JOIN lineitem ON l_suppkey = s_suppkey
        |  WHERE s_nationkey = 1
        |) ORDER BY path""".stripMargin,
    "q_xg" ->
      """SELECT path FROM (
        |  SELECT '/orders/' || CAST(o_orderkey AS VARCHAR) AS path FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 95000
        |  UNION
        |  SELECT '/customer/' || CAST(o_custkey AS VARCHAR) FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 95000
        |) ORDER BY path""".stripMargin,
    "q_xg_2level" ->
      """SELECT path FROM (
        |  SELECT '/lineitem/' || CAST(l_orderkey AS VARCHAR) || '-' ||
        |    CAST(l_linenumber AS VARCHAR) || '-' || CAST(l_partkey AS VARCHAR)
        |    || '-' || CAST(l_suppkey AS VARCHAR) AS path
        |  FROM lineitem WHERE l_quantity > 49.5
        |  UNION
        |  SELECT '/orders/' || CAST(l_orderkey AS VARCHAR) FROM lineitem
        |  WHERE l_quantity > 49.5
        |  UNION
        |  SELECT '/customer/' || CAST(o_custkey AS VARCHAR)
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_quantity > 49.5
        |) ORDER BY path""".stripMargin,
    "q_yg_in" ->
      """SELECT path FROM (
        |  SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS path FROM customer
        |  WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9900
        |  UNION
        |  SELECT '/orders/' || CAST(o_orderkey AS VARCHAR)
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9900
        |    AND o_totalprice > 100000
        |) ORDER BY path""".stripMargin,
    "q_xg_nswild" ->
      """SELECT path FROM (
        |  SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS path FROM customer
        |  WHERE c_mktsegment = 'MACHINERY'
        |  UNION
        |  SELECT DISTINCT '/nation/' || CAST(c_nationkey AS VARCHAR)
        |  FROM customer WHERE c_mktsegment = 'MACHINERY'
        |) ORDER BY path""".stripMargin,
    "q_xg_uriwild" ->
      """SELECT path FROM (
        |  SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS path FROM customer
        |  WHERE c_mktsegment = 'FURNITURE'
        |  UNION
        |  SELECT DISTINCT '/nation/' || CAST(c_nationkey AS VARCHAR)
        |  FROM customer WHERE c_mktsegment = 'FURNITURE'
        |) ORDER BY path""".stripMargin,
    "q_yg_out" ->
      """SELECT path FROM (
        |  SELECT '/supplier/' || CAST(s_suppkey AS VARCHAR) AS path FROM supplier
        |  WHERE s_acctbal > 9000
        |  UNION
        |  SELECT DISTINCT '/nation/' || CAST(s_nationkey AS VARCHAR)
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  WHERE s_acctbal > 9000 AND n_name = 'NATION_9'
        |) ORDER BY path""".stripMargin,
    "q_yg_multi" ->
      """SELECT path FROM (
        |  SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS path FROM customer
        |  WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9900
        |  UNION
        |  SELECT '/orders/' || CAST(o_orderkey AS VARCHAR)
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9900
        |    AND o_totalprice > 100000
        |  UNION
        |  SELECT DISTINCT '/nation/' || CAST(c_nationkey AS VARCHAR)
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9900
        |    AND n_name = 'NATION_9'
        |) ORDER BY path""".stripMargin,
    "q_yg_fieldlist" ->
      """SELECT path FROM (
        |  SELECT '/lineitem/' || CAST(l_orderkey AS VARCHAR) || '-' ||
        |    CAST(l_linenumber AS VARCHAR) || '-' || CAST(l_partkey AS VARCHAR)
        |    || '-' || CAST(l_suppkey AS VARCHAR) AS path
        |  FROM lineitem WHERE l_quantity > 49.5
        |  UNION
        |  SELECT DISTINCT '/orders/' || CAST(o_orderkey AS VARCHAR)
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_quantity > 49.5 AND o_orderpriority = '1-URGENT'
        |  UNION
        |  SELECT DISTINCT '/part/' || CAST(p_partkey AS VARCHAR)
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_quantity > 49.5 AND p_retailprice > 2000
        |) ORDER BY path""".stripMargin,
    "q_gqp_multi" ->
      """SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS path FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |   OR EXISTS (SELECT 1 FROM nation
        |  WHERE n_nationkey = c_nationkey AND n_name = 'NATION_9')
        |ORDER BY path""".stripMargin,
    "q_xg_fieldlist" ->
      """SELECT path FROM (
        |  SELECT '/lineitem/' || CAST(l_orderkey AS VARCHAR) || '-' ||
        |    CAST(l_linenumber AS VARCHAR) || '-' || CAST(l_partkey AS VARCHAR)
        |    || '-' || CAST(l_suppkey AS VARCHAR) AS path
        |  FROM lineitem WHERE l_quantity > 49.5
        |  UNION
        |  SELECT DISTINCT '/orders/' || CAST(l_orderkey AS VARCHAR)
        |  FROM lineitem WHERE l_quantity > 49.5
        |  UNION
        |  SELECT DISTINCT '/part/' || CAST(l_partkey AS VARCHAR)
        |  FROM lineitem WHERE l_quantity > 49.5
        |) ORDER BY path""".stripMargin,
    "q_xg_joker_filtered" ->
      """SELECT path FROM (
        |  SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS path FROM customer
        |  WHERE c_mktsegment = 'AUTOMOBILE'
        |  UNION
        |  SELECT DISTINCT '/nation/' || CAST(c_nationkey AS VARCHAR)
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  WHERE c_mktsegment = 'AUTOMOBILE' AND n_name = 'NATION_9'
        |) ORDER BY path""".stripMargin,
    "q_gqp" ->
      """SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS path FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        |ORDER BY path""".stripMargin,
    "q_gqp_2hop" ->
      """SELECT '/supplier/' || CAST(s_suppkey AS VARCHAR) AS path FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_suppkey = s_suppkey AND l_quantity > 49
        |    AND o_orderpriority = '1-URGENT')
        |ORDER BY path""".stripMargin,
    "q_xg_all" ->
      """SELECT path FROM (
        |  SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS path FROM customer
        |  WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9900
        |  UNION
        |  SELECT DISTINCT '/nation/' || CAST(c_nationkey AS VARCHAR)
        |  FROM customer
        |  WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9900
        |) ORDER BY path""".stripMargin,
    "q_xg_filtered" ->
      """SELECT path FROM (
        |  SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS path FROM customer
        |  WHERE c_mktsegment = 'BUILDING'
        |  UNION
        |  SELECT DISTINCT '/nation/' || CAST(c_nationkey AS VARCHAR)
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  WHERE c_mktsegment = 'BUILDING' AND n_name = 'NATION_9'
        |) ORDER BY path""".stripMargin)
}
