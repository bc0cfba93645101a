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
        |  ?n ont:name "NATION_7" .
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

    // UNION: customers in nation 7 ∪ entities in nation 3 — branch-only
    // variables stay unbound (null) in the other branch
    "q_sparql_union" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?x WHERE {
        |  { ?x ont:refNation ?n . ?n ont:name "NATION_7" .
        |    ?x ont:mktsegment ?m }
        |  UNION
        |  { ?x ont:refNation ?n2 . ?n2 ont:name "NATION_3" .
        |    ?x ont:acctbal ?a }
        |} ORDER BY ?x""".stripMargin)),

    // sequence property path: orders —refCustomer/refNation→ nation
    "q_sparql_path" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?o ?n WHERE {
        |  ?o ont:totalprice ?p .
        |  FILTER (?p > 400000)
        |  ?o ont:refCustomer/ont:refNation ?n .
        |} ORDER BY ?o""".stripMargin)),

    // aggregates: order count and max price per market segment
    "q_sparql_agg" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?m (COUNT(?o) AS ?cnt) (MAX(?p) AS ?maxprice) WHERE {
        |  ?c ont:mktsegment ?m .
        |  ?o ont:refCustomer ?c .
        |  ?o ont:totalprice ?p .
        |} GROUP BY ?m ORDER BY ?m""".stripMargin)),

    // aggregates + HAVING: only segments with enough expensive orders
    "q_sparql_having" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?m (COUNT(?o) AS ?cnt) WHERE {
        |  ?c ont:mktsegment ?m .
        |  ?o ont:refCustomer ?c .
        |  ?o ont:totalprice ?p .
        |  FILTER (?p > 300000)
        |} GROUP BY ?m HAVING (?cnt >= 1200) ORDER BY ?m""".stripMargin)),

    // regex + string-function FILTERs
    "q_sparql_regex" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?n ?name WHERE {
        |  ?n ont:refRegion ?r .
        |  ?n ont:name ?name .
        |  FILTER (regex(?name, "^NATION_1[0-9]$") || strends(?name, "_7"))
        |} ORDER BY ?n""".stripMargin)),

    // CONSTRUCT: derive new edges from matched solutions
    "q_sparql_construct" -> ((s, dir) =>
      Sparql.construct(GraftStore.forDir(s, dir),
        """PREFIX ont: <cmwell://ont#>
          |CONSTRUCT { ?c <cmwell://ont#inNation> ?n }
          |WHERE { ?c ont:refNation ?n . ?n ont:name "NATION_7" }""".stripMargin)
        .orderBy("subject")),

    // VALUES: inline data joins like a broadcast-able literal relation
    "q_sparql_values" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?c ?m WHERE {
        |  ?c ont:mktsegment ?m .
        |  VALUES ?m { "BUILDING" "MACHINERY" }
        |} ORDER BY ?c""".stripMargin)),

    // BIND: computed column flows into projection
    "q_sparql_bind" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?name ?tag WHERE {
        |  ?n ont:refRegion ?r .
        |  ?n ont:name ?name .
        |  BIND(CONCAT("nation:", ?name) AS ?tag)
        |} ORDER BY ?name""".stripMargin)),

    // MINUS: BUILDING customers without any 400k+ order
    "q_sparql_minus" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?c WHERE {
        |  ?c ont:mktsegment "BUILDING" .
        |  MINUS { ?o ont:refCustomer ?c . ?o ont:totalprice ?p .
        |          FILTER (?p > 400000) }
        |} ORDER BY ?c""".stripMargin)),

    // FILTER EXISTS: BUILDING customers with some 450k+ order
    "q_sparql_exists" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?c WHERE {
        |  ?c ont:mktsegment "BUILDING" .
        |  FILTER EXISTS { ?o ont:refCustomer ?c . ?o ont:totalprice ?p .
        |                  FILTER (?p > 450000) }
        |} ORDER BY ?c""".stripMargin)),

    // FILTER NOT EXISTS: BUILDING customers with no 450k+ order
    "q_sparql_notexists" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?c WHERE {
        |  ?c ont:mktsegment "BUILDING" .
        |  FILTER NOT EXISTS { ?o ont:refCustomer ?c . ?o ont:totalprice ?p .
        |                      FILTER (?p > 450000) }
        |} ORDER BY ?c""".stripMargin)),

    // alternative path: one scan over the union of two edge sets
    "q_sparql_alt" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?x ?t WHERE {
        |  ?x (ont:refNation|ont:refRegion) ?t
        |} ORDER BY ?x ?t""".stripMargin)),

    // zero-or-more path: identity plus the closure from a bound subject
    "q_sparql_star_path" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?x WHERE { <cmwell://nation/3> ont:refRegion* ?x }
        |ORDER BY ?x""".stripMargin)),

    // ASK: existence short-circuits (limit 1 under the count)
    "q_sparql_ask" -> ((s, dir) =>
      Sparql.ask(GraftStore.forDir(s, dir),
        """PREFIX ont: <cmwell://ont#>
          |ASK { ?n ont:name "NATION_7" . ?n ont:refRegion ?r }"""
          .stripMargin)),

    // DESCRIBE: all current triples of one resource
    "q_sparql_describe" -> ((s, dir) =>
      Sparql.describe(GraftStore.forDir(s, dir),
        "DESCRIBE <cmwell://customer/42>").orderBy("predicate")),

    // langMatches over the lang-tagged documents text — the lang tag
    // rides the value as a shadow column through the BGP joins
    "q_sparql_lang" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?d ?t WHERE {
        |  ?d ont:text ?t .
        |  FILTER langmatches(?t, "fr")
        |} ORDER BY ?d""".stripMargin)),

    // subquery: customers of the most numerous market segment —
    // the inner SELECT aggregates, orders by the count (numeric
    // shadow) and LIMITs; the outer pattern joins on ?m
    "q_sparql_subquery" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?c WHERE {
        |  { SELECT ?m (COUNT(?c2) AS ?cnt) WHERE { ?c2 ont:mktsegment ?m }
        |    GROUP BY ?m ORDER BY DESC(?cnt) ?m LIMIT 1 }
        |  ?c ont:mktsegment ?m .
        |} ORDER BY ?c""".stripMargin)),

    // predicate-object list (`;`) + blank-node property list (`[...]`)
    // — the Turtle-style shorthand every published SPARQL example uses
    "q_sparql_proplist" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?c WHERE {
        |  ?c ont:mktsegment "BUILDING" ;
        |     ont:acctbal ?b ;
        |     ont:refNation [ ont:name "NATION_7" ] .
        |  FILTER (?b > 1000)
        |} ORDER BY ?c""".stripMargin)),

    // closure over a parenthesized alternation: one transitive closure
    // of the UNION edge set (refNation ∪ refRegion)
    "q_sparql_alt_closure" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?x WHERE {
        |  <cmwell://customer/42> (ont:refNation|ont:refRegion)+ ?x
        |} ORDER BY ?x""".stripMargin)),

    // GROUP_CONCAT with SEPARATOR (elements sorted lexically for
    // determinism — SPARQL leaves the order open)
    "q_sparql_gconcat" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?r (GROUP_CONCAT(?nm; SEPARATOR=",") AS ?names) WHERE {
        |  ?n ont:refRegion ?r . ?n ont:name ?nm .
        |} GROUP BY ?r ORDER BY ?r""".stripMargin)),

    // BIND IF() — conditional derived column over a numeric binding
    "q_sparql_bind_if" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?c ?tier WHERE {
        |  ?c ont:acctbal ?b .
        |  BIND(IF(?b > 5000, "high", "low") AS ?tier)
        |} ORDER BY ?c""".stripMargin)),

    // negated property set: every nation property EXCEPT the listed
    // ones — one complemented scan, no enumeration of the schema
    "q_sparql_negset" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?n ?v WHERE {
        |  ?n ont:refRegion ?r .
        |  ?n !(ont:refRegion|ont:nationkey|ont:regionkey) ?v .
        |} ORDER BY ?n ?v""".stripMargin)),

    // term-type functions: isLiteral + datatype() over a variable
    // predicate — the vType shadow discriminates refs from typed
    // literals at scan time
    "q_sparql_typefn" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        |SELECT ?n ?o WHERE {
        |  ?n ont:refRegion ?r .
        |  ?n ?p ?o .
        |  FILTER (isLiteral(?o) && datatype(?o) = xsd:long && ?o > 10)
        |} ORDER BY ?n ?o""".stripMargin)),

    // inverse member inside an alternation: customers/suppliers OF the
    // nation (swapped-ends scan) ∪ the nation's region (forward scan)
    "q_sparql_alt_inv" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?x WHERE {
        |  <cmwell://nation/3> (^ont:refNation|ont:refRegion) ?x
        |} ORDER BY ?x""".stripMargin)),

    // closure over a mixed-direction alternation: orders OF the
    // customer (inverse edges) plus the forward nation/region chain,
    // walked in one frontier
    "q_sparql_alt_inv_closure" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?x WHERE {
        |  <cmwell://customer/42>
        |    (^ont:refCustomer|ont:refNation|ont:refRegion)+ ?x
        |} ORDER BY ?x""".stripMargin)),

    // GRAPH ?g — named-graph pattern binding the graph variable: every
    // document value is quad-tagged /graph/<source> by the loader, so
    // both patterns carry the same tag and join on (?d, ?g)
    "q_sparql_graph" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?d ?g WHERE {
        |  GRAPH ?g { ?d ont:lang "de" . ?d ont:n_chars ?n . FILTER (?n > 200) }
        |} ORDER BY ?d ?g""".stripMargin)),

    // GRAPH <g> — bound graph: the store is scoped to one tag, nested
    // FILTER and patterns inherit the restriction
    "q_sparql_graph_bound" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?d WHERE {
        |  GRAPH <cmwell://graph/src7> { ?d ont:n_chars ?n . FILTER (?n > 300) }
        |} ORDER BY ?d""".stripMargin)),

    // FROM NAMED — restricts which graphs GRAPH ?g can match
    "q_sparql_from_named" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?d ?g
        |FROM NAMED <cmwell://graph/src1>
        |FROM NAMED <cmwell://graph/src2>
        |WHERE { GRAPH ?g { ?d ont:n_chars ?n . FILTER (?n > 300) } }
        |ORDER BY ?d ?g""".stripMargin)),

    // FROM — restricts the default graph to the listed graphs' merge:
    // patterns outside GRAPH see only src3-tagged values
    "q_sparql_from" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?d
        |FROM <cmwell://graph/src3>
        |WHERE { ?d ont:n_chars ?n . FILTER (?n > 400) }
        |ORDER BY ?d""".stripMargin)),

    // residual ARQ builtins in one conformance query: NOW() compared in
    // FILTER position, IF(...) as a FILTER (effective boolean value)
    // and in BIND, sameTerm var-var identity, UUID()/STRUUID()/BNODE()
    // shape checks (value is fresh per solution — only length / blank
    // marker are deterministic)
    "q_sparql_builtins" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?n ?name ?tag WHERE {
        |  ?n ont:refRegion ?r .
        |  ?n ont:name ?name .
        |  ?n2 ont:name ?name .
        |  FILTER (sameTerm(?n, ?n2))
        |  FILTER (NOW() > "2020-01-01T00:00:00")
        |  FILTER (IF(?name != "", "t", "f") = "t")
        |  BIND(BNODE() AS ?b)
        |  FILTER (isBlank(?b))
        |  BIND(UUID() AS ?u)
        |  FILTER (strlen(?u) = 45)
        |  BIND(STRUUID() AS ?su)
        |  FILTER (strlen(?su) = 36)
        |  BIND(IF(strlen(?name) >= 9, "long", "short") AS ?tag)
        |} ORDER BY ?n""".stripMargin)),

    // date/time accessor builtins (SPARQL 17.4.5) over the store's
    // xsd:dateTime lexical forms: YEAR/MONTH/DAY slice the date,
    // HOURS/MINUTES/SECONDS the time, TZ/TIMEZONE the designator —
    // all pure projections over one predicate scan
    "q_sparql_datefn" -> ((s, dir) => run(s, dir,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?o ?y ?mo ?d ?tz WHERE {
        |  ?o ont:orderdate ?w .
        |  BIND(YEAR(?w) AS ?y)
        |  BIND(MONTH(?w) AS ?mo)
        |  BIND(DAY(?w) AS ?d)
        |  BIND(HOURS(?w) AS ?h)
        |  BIND(TZ(?w) AS ?tz)
        |  BIND(TIMEZONE(?w) AS ?dur)
        |  FILTER (?dur = "PT0S")
        |  FILTER (?h = 0)
        |  FILTER (?y = 1995)
        |  FILTER (?mo <= 2)
        |} ORDER BY ?o""".stripMargin)),

    // `POST /_sp`: PATHS search requests populate the queried subgraph
    // (here: BUILDING customers + all nations); the SPARQL query runs
    // against just that slice — suppliers and other segments are
    // invisible even though the star pattern would match them
    "q_sp" -> ((s, dir) => {
      import graft.ops.Search
      Sparql.sp(GraftStore.forDir(s, dir),
        Seq(Search.Request(path = "/customer",
              qp = Some("mktsegment::BUILDING")),
            Search.Request(path = "/nation")),
        """PREFIX ont: <cmwell://ont#>
          |SELECT ?c ?nm WHERE {
          |  ?c ont:refNation ?n . ?n ont:name ?nm .
          |} ORDER BY ?c""".stripMargin)
    }),

    // SPARQL IMPORTS analog (SpHandler.scala:201-203 loads stored Jena
    // custom functions into the evaluation context): a registered
    // function dispatches from FILTER position as a Spark UDF. The
    // probe — digit-sum-divisibility over the name's digits — is not
    // expressible by any builtin, so the rows exist only through the
    // registered function; the oracle reproduces the arithmetic on
    // the custkey digits (the name's digit content).
    "q_sparql_imports" -> ((s, dir) => {
      Sparql.registerFunction(s, "graftDigitSumDiv") { (v, n) =>
        v != null && v.iterator.filter(_.isDigit).map(_ - '0').sum %
          n.toInt == 0
      }
      run(s, dir,
        """PREFIX ont: <cmwell://ont#>
          |SELECT ?c ?n WHERE {
          |  ?c ont:name ?n .
          |  ?c ont:mktsegment ?m .
          |  FILTER graftDigitSumDiv(?n, "7")
          |} ORDER BY ?c""".stripMargin)
    }))

  val oracles: Map[String, String] = Map(
    "q_sparql_imports" ->
      """WITH k AS (SELECT c_custkey, c_name,
        |  CAST(c_custkey AS VARCHAR) AS ck FROM customer)
        |SELECT '/customer/' || ck AS c, c_name AS n
        |FROM k
        |WHERE list_sum(list_transform(generate_series(1, length(ck)),
        |  i -> CAST(substr(ck, i, 1) AS INT))) % 7 = 0
        |ORDER BY c""".stripMargin,
    "q_sparql_builtins" ->
      """SELECT '/nation/' || n_nationkey AS n, n_name AS name,
        |  CASE WHEN length(n_name) >= 9 THEN 'long' ELSE 'short' END AS tag
        |FROM nation ORDER BY n""".stripMargin,
    "q_sparql_datefn" ->
      """SELECT '/orders/' || o_orderkey AS o,
        |  CAST(year(o_orderdate) AS VARCHAR) AS y,
        |  CAST(month(o_orderdate) AS VARCHAR) AS mo,
        |  CAST(day(o_orderdate) AS VARCHAR) AS d,
        |  'Z' AS tz
        |FROM orders
        |WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 2
        |ORDER BY o""".stripMargin,
    "q_sparql_alt_inv" ->
      """SELECT x FROM (
        |  SELECT '/customer/' || c_custkey AS x FROM customer
        |  WHERE c_nationkey = 3
        |  UNION ALL
        |  SELECT '/supplier/' || s_suppkey FROM supplier
        |  WHERE s_nationkey = 3
        |  UNION ALL
        |  SELECT '/region/' || n_regionkey FROM nation
        |  WHERE n_nationkey = 3)
        |ORDER BY x""".stripMargin,
    "q_sparql_alt_inv_closure" ->
      """SELECT x FROM (
        |  SELECT '/orders/' || o_orderkey AS x FROM orders
        |  WHERE o_custkey = 42
        |  UNION ALL
        |  SELECT '/nation/' || c_nationkey FROM customer WHERE c_custkey = 42
        |  UNION ALL
        |  SELECT '/region/' || n_regionkey FROM customer
        |    JOIN nation ON c_nationkey = n_nationkey
        |  WHERE c_custkey = 42)
        |ORDER BY x""".stripMargin,
    "q_sparql_graph" ->
      """SELECT '/documents/' || doc_id AS d, '/graph/' || source AS g
        |FROM documents WHERE lang = 'de' AND n_chars > 200
        |ORDER BY d, g""".stripMargin,
    "q_sparql_graph_bound" ->
      """SELECT '/documents/' || doc_id AS d FROM documents
        |WHERE source = 'src7' AND n_chars > 300 ORDER BY d""".stripMargin,
    "q_sparql_from_named" ->
      """SELECT '/documents/' || doc_id AS d, '/graph/' || source AS g
        |FROM documents WHERE source IN ('src1','src2') AND n_chars > 300
        |ORDER BY d, g""".stripMargin,
    "q_sparql_from" ->
      """SELECT '/documents/' || doc_id AS d FROM documents
        |WHERE source = 'src3' AND n_chars > 400 ORDER BY d""".stripMargin,
    "q_sparql_negset" ->
      """SELECT '/nation/' || n_nationkey AS n, n_name AS v
        |FROM nation ORDER BY n, v""".stripMargin,
    "q_sparql_typefn" ->
      """SELECT '/nation/' || n_nationkey AS n,
        |  CAST(n_nationkey AS VARCHAR) AS o
        |FROM nation WHERE n_nationkey > 10 ORDER BY n, o""".stripMargin,
    "q_sparql_union" ->
      """SELECT x FROM (
        |  SELECT '/customer/' || c_custkey AS x FROM customer
        |    JOIN nation ON c_nationkey = n_nationkey WHERE n_name = 'NATION_7'
        |  UNION ALL
        |  SELECT '/customer/' || c_custkey FROM customer
        |    JOIN nation ON c_nationkey = n_nationkey WHERE n_name = 'NATION_3'
        |  UNION ALL
        |  SELECT '/supplier/' || s_suppkey FROM supplier
        |    JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3')
        |ORDER BY x""".stripMargin,
    "q_sparql_path" ->
      """SELECT '/orders/' || o_orderkey AS o, '/nation/' || c_nationkey AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 400000 ORDER BY o""".stripMargin,
    "q_sparql_agg" ->
      """SELECT c_mktsegment AS m, count(*) AS cnt,
        |  max(o_totalprice) AS maxprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY m""".stripMargin,
    "q_sparql_having" ->
      """SELECT c_mktsegment AS m, count(*) AS cnt
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 300000
        |GROUP BY 1 HAVING count(*) >= 1200 ORDER BY m""".stripMargin,
    "q_sparql_regex" ->
      """SELECT '/nation/' || n_nationkey AS n, n_name AS name FROM nation
        |WHERE regexp_matches(n_name, '^NATION_1[0-9]$') OR n_name LIKE '%\_7' ESCAPE '\'
        |ORDER BY n""".stripMargin,
    "q_sparql_star" ->
      """SELECT c FROM (
        |  SELECT '/customer/' || c_custkey AS c FROM customer
        |    JOIN nation ON c_nationkey = n_nationkey WHERE n_name = 'NATION_7'
        |  UNION ALL
        |  SELECT '/supplier/' || s_suppkey AS c FROM supplier
        |    JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_7')
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
    "q_sparql_values" ->
      """SELECT '/customer/' || c_custkey AS c, c_mktsegment AS m
        |FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        |ORDER BY c""".stripMargin,
    "q_sparql_bind" ->
      """SELECT n_name AS name, 'nation:' || n_name AS tag FROM nation
        |ORDER BY name""".stripMargin,
    "q_sparql_minus" ->
      """SELECT '/customer/' || c_custkey AS c FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY c""".stripMargin,
    "q_sparql_exists" ->
      """SELECT '/customer/' || c_custkey AS c FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND EXISTS
        |  (SELECT 1 FROM orders
        |   WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c""".stripMargin,
    "q_sparql_notexists" ->
      """SELECT '/customer/' || c_custkey AS c FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND NOT EXISTS
        |  (SELECT 1 FROM orders
        |   WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c""".stripMargin,
    "q_sparql_alt" ->
      """SELECT x, t FROM (
        |  SELECT '/customer/' || c_custkey AS x,
        |    '/nation/' || c_nationkey AS t FROM customer
        |  UNION ALL
        |  SELECT '/supplier/' || s_suppkey, '/nation/' || s_nationkey
        |  FROM supplier
        |  UNION ALL
        |  SELECT '/nation/' || n_nationkey, '/region/' || n_regionkey
        |  FROM nation)
        |ORDER BY x, t""".stripMargin,
    "q_sparql_star_path" ->
      """SELECT x FROM (
        |  SELECT '/nation/3' AS x
        |  UNION ALL
        |  SELECT '/region/' || n_regionkey FROM nation
        |  WHERE n_nationkey = 3)
        |ORDER BY x""".stripMargin,
    "q_sparql_ask" ->
      """SELECT count(*) > 0 AS ask FROM nation
        |WHERE n_name = 'NATION_7'""".stripMargin,
    "q_sparql_lang" ->
      """SELECT '/documents/' || doc_id AS d, text AS t FROM documents
        |WHERE lower(lang) = 'fr' OR lower(lang) LIKE 'fr-%'
        |ORDER BY d""".stripMargin,
    "q_sparql_subquery" ->
      """SELECT '/customer/' || c_custkey AS c FROM customer
        |WHERE c_mktsegment = (
        |  SELECT c_mktsegment FROM customer GROUP BY 1
        |  ORDER BY count(*) DESC, c_mktsegment LIMIT 1)
        |ORDER BY c""".stripMargin,
    "q_sparql_gconcat" ->
      """SELECT '/region/' || n_regionkey AS r,
        |  string_agg(n_name, ',' ORDER BY n_name) AS names
        |FROM nation GROUP BY 1 ORDER BY r""".stripMargin,
    "q_sparql_bind_if" ->
      """SELECT c, tier FROM (
        |  SELECT '/customer/' || c_custkey AS c,
        |    CASE WHEN c_acctbal > 5000 THEN 'high' ELSE 'low' END AS tier
        |  FROM customer
        |  UNION ALL
        |  SELECT '/supplier/' || s_suppkey,
        |    CASE WHEN s_acctbal > 5000 THEN 'high' ELSE 'low' END
        |  FROM supplier)
        |ORDER BY c""".stripMargin,
    "q_sparql_proplist" ->
      """SELECT '/customer/' || c_custkey AS c FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000
        |  AND n_name = 'NATION_7'
        |ORDER BY c""".stripMargin,
    "q_sparql_alt_closure" ->
      """SELECT x FROM (
        |  SELECT '/nation/' || c_nationkey AS x FROM customer
        |  WHERE c_custkey = 42
        |  UNION ALL
        |  SELECT '/region/' || n_regionkey FROM customer
        |    JOIN nation ON c_nationkey = n_nationkey
        |  WHERE c_custkey = 42)
        |ORDER BY x""".stripMargin,
    "q_sp" ->
      """SELECT '/customer/' || c_custkey AS c, n_name AS nm
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_mktsegment = 'BUILDING' ORDER BY c""".stripMargin,
    "q_sparql_describe" ->
      """SELECT subject, predicate, obj FROM (
        |  SELECT '/customer/' || c_custkey AS subject,
        |    'acctbal' AS predicate, CAST(c_acctbal AS VARCHAR) AS obj
        |  FROM customer WHERE c_custkey = 42
        |  UNION ALL SELECT '/customer/' || c_custkey, 'custkey',
        |    CAST(c_custkey AS VARCHAR) FROM customer WHERE c_custkey = 42
        |  UNION ALL SELECT '/customer/' || c_custkey, 'mktsegment',
        |    c_mktsegment FROM customer WHERE c_custkey = 42
        |  UNION ALL SELECT '/customer/' || c_custkey, 'name', c_name
        |  FROM customer WHERE c_custkey = 42
        |  UNION ALL SELECT '/customer/' || c_custkey, 'nationkey',
        |    CAST(c_nationkey AS VARCHAR) FROM customer WHERE c_custkey = 42
        |  UNION ALL SELECT '/customer/' || c_custkey, 'refNation',
        |    '/nation/' || c_nationkey FROM customer WHERE c_custkey = 42)
        |ORDER BY predicate""".stripMargin,
    "q_sparql_construct" ->
      """SELECT subject, 'inNation' AS predicate, obj FROM (
        |  SELECT '/customer/' || c_custkey AS subject,
        |    '/nation/' || c_nationkey AS obj FROM customer
        |    JOIN nation ON c_nationkey = n_nationkey WHERE n_name = 'NATION_7'
        |  UNION ALL
        |  SELECT '/supplier/' || s_suppkey, '/nation/' || s_nationkey
        |  FROM supplier
        |    JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_7')
        |ORDER BY subject""".stripMargin)
}
