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

  private def pathsOf(df: DataFrame): DataFrame =
    df.select(col("system.path").as("path")).orderBy("path")

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
        Graph.parseXg("refOrders.refCustomer", Graph.refFields(store))))
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
    // BUILDING customers along refNation, keeping only GERMANY targets
    "q_xg_filtered" -> ((s, dir) => {
      val store = st(s, dir)
      val base = Search.run(store, Search.Request(path = "/customer",
        qp = Some("mktsegment::BUILDING")))
      pathsOf(Graph.xg(store, base,
        Graph.parseXg("refNation[name::GERMANY]", Graph.refFields(store))))
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
        .orderBy("id")))

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
        |  WHERE c_mktsegment = 'BUILDING' AND n_name = 'GERMANY'
        |) ORDER BY path""".stripMargin)
}
