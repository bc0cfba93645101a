package graft

import graft.model.GraftStore
import graft.sparql.Sparql
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Declared SPARQL queries (SURVEY.md §2.3 `_sp`/`_sparql`): star,
  * chain + typed FILTER, OPTIONAL — each compiled to joins over the
  * quads view and checked against relational oracles. */
object SparqlQueries {

  private def run(s: SparkSession, dir: String, q: String): DataFrame =
    Sparql.select(GraftStore.forDir(s, dir), q)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // star: entities in a named nation — matches BOTH customers and
    // suppliers (schema-free pattern matching, the RDF point)
    "q_sparql_star" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?c WHERE {
        |  ?c ont:refNation ?n .
        |  ?n ont:name "GERMANY" .
        |} ORDER BY ?c""".stripMargin)),

    // chain: lineitem → orders → customer with a typed FILTER
    "q_sparql_chain" -> ((s, dir) => run(s, dir,
      """SELECT ?l ?c WHERE {
        |  ?l <cmwell://ont#refOrders> ?o .
        |  ?o <cmwell://ont#refCustomer> ?c .
        |  ?l <cmwell://ont#quantity> ?q .
        |  FILTER (?q > 45)
        |} ORDER BY ?l ?c""".stripMargin)),

    // OPTIONAL: BUILDING customers with their orders, if any
    "q_sparql_optional" -> ((s, dir) => run(s, dir,
      """SELECT ?c ?o WHERE {
        |  ?c <cmwell://ont#mktsegment> "BUILDING" .
        |  OPTIONAL { ?o <cmwell://ont#refCustomer> ?c }
        |} ORDER BY ?c ?o""".stripMargin)),

    // CONSTRUCT: derive new edges from matched solutions
    "q_sparql_construct" -> ((s, dir) =>
      Sparql.construct(GraftStore.forDir(s, dir),
        """PREFIX ont: <cmwell://ont#>
          |CONSTRUCT { ?c <cmwell://ont#inNation> ?n }
          |WHERE { ?c ont:refNation ?n . ?n ont:name "GERMANY" }""".stripMargin)
        .orderBy("subject")))

  val oracles: Map[String, String] = Map(
    "q_sparql_star" ->
      """SELECT c FROM (
        |  SELECT '/customer/' || c_custkey AS c FROM customer
        |    JOIN nation ON c_nationkey = n_nationkey WHERE n_name = 'GERMANY'
        |  UNION ALL
        |  SELECT '/supplier/' || s_suppkey AS c FROM supplier
        |    JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'GERMANY')
        |ORDER BY c""".stripMargin,
    "q_sparql_chain" ->
      """SELECT '/lineitem/' || l_orderkey || '-' || l_linenumber || '-'
        |    || l_partkey || '-' || l_suppkey AS l,
        |  '/customer/' || o_custkey AS c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_quantity > 45 ORDER BY l, c""".stripMargin,
    "q_sparql_optional" ->
      """SELECT '/customer/' || c_custkey AS c, '/orders/' || o_orderkey AS o
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c, o NULLS FIRST""".stripMargin,
    "q_sparql_construct" ->
      """SELECT subject, 'inNation' AS predicate, obj FROM (
        |  SELECT '/customer/' || c_custkey AS subject,
        |    '/nation/' || c_nationkey AS obj FROM customer
        |    JOIN nation ON c_nationkey = n_nationkey WHERE n_name = 'GERMANY'
        |  UNION ALL
        |  SELECT '/supplier/' || s_suppkey, '/nation/' || s_nationkey
        |  FROM supplier
        |    JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'GERMANY')
        |ORDER BY subject""".stripMargin)
}
