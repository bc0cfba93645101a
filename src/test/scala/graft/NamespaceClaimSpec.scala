package graft

import graft.ingest.{Ingest, Rdf}
import graft.model.GraftStore
import graft.ops.{Formatters, Search}
import graft.qp.Namespaces
import graft.sparql.Sparql
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Canonical-key claims: two vocabularies sharing a local name must
  * land on DISTINCT field keys (SURVEY §7.5 / the reference's internal
  * ns-mangling, AbstractJsonSerializer.scala:37-49), resolvable through
  * every qp spelling, reconstructible by the formatters, and
  * distinguishable in SPARQL. */
class NamespaceClaimSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkSuite.session

  private val V1 = "a://voc1#"
  private val V2 = "b://voc2#"

  // two vocabularies, same local name `title`, one subject each + one
  // subject carrying BOTH predicates
  private def lines = Seq(
    s"""<c://co/x> <${V1}title> "x-one" .""",
    s"""<c://co/y> <${V2}title> "y-two" .""",
    s"""<c://co/z> <${V1}title> "z-one" .""",
    s"""<c://co/z> <${V2}title> "z-two" .""")

  private lazy val store: GraftStore = {
    import spark.implicits._
    val inf = Ingest.ingest(spark, Ingest.emptyStore(spark),
      lines.toDS(), java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    GraftStore.fromInfotons(spark, inf)
  }

  test("claim rules: first namespace owns bare, later ones qualify") {
    val k1 = Namespaces.claim("x://first#", "claimspec_f")
    val k2 = Namespaces.claim("y://second#", "claimspec_f")
    assert(k1 == "claimspec_f")
    assert(k2 == "claimspec_f.$" + Namespaces.hashOf("y://second#"))
    // idempotent
    assert(Namespaces.claim("x://first#", "claimspec_f") == k1)
    assert(Namespaces.claim("y://second#", "claimspec_f") == k2)
    // pure lookup agrees; unclaimed falls back deterministically
    assert(Namespaces.keyOf("x://first#claimspec_f") == k1)
    assert(Namespaces.keyOf("y://second#claimspec_f") == k2)
    assert(Namespaces.keyOf("z://third#claimspec_f") ==
      "claimspec_f.$" + Namespaces.hashOf("z://third#"))
    assert(Namespaces.keyOf("q://any#claimspec_unclaimed") ==
      "claimspec_unclaimed")
  }

  test("loader locals are reserved for the default namespace") {
    graft.model.TableLoader.fieldTypes // force the pre-claim object init
    // `name` is a loader key — a foreign vocabulary can never take it
    val k = Namespaces.claim("p://foreign#", "name")
    assert(k == "name.$" + Namespaces.hashOf("p://foreign#"))
    assert(Namespaces.keyOf(Namespaces.DefaultNs + "name") == "name")
  }

  test("ingest mints distinct keys and every qp spelling resolves") {
    // claimAll sorts, so a://voc1# claims `title` bare, b://voc2#
    // gets the qualified key
    val h2 = Namespaces.hashOf(V2)
    val z = store.current.where(col("system.path") === "/co/z")
      .select(map_keys(col("fields"))).head().getSeq[String](0).toSet
    assert(z == Set("title", s"title.$$$h2"))
    // $full-uri$ spelling hits exactly its vocabulary
    def vals(k: String) = store.current
      .where(col("system.path") === "/co/z")
      .select(explode(col("fields")(Namespaces.resolve(k))))
      .collect().map(_.getStruct(0).getString(0)).toSet
    assert(vals(s"$$${V1}title$$") == Set("z-one"))
    assert(vals(s"$$${V2}title$$") == Set("z-two"))
    // hash spelling
    assert(Namespaces.resolve(s"title.$$$h2") == s"title.$$$h2")
    // prefix spelling after registering
    Namespaces.register("v2", V2)
    assert(Namespaces.resolve("title.v2") == s"title.$$$h2")
    // bare local = the bare-key owner (voc1)
    assert(Namespaces.resolve("title") == "title")
  }

  test("search by qualified field finds only that vocabulary") {
    val hits = Search.run(store, Search.Request(path = "/co",
      descendants = true, qp = Some(s"$$${V2}title$$::z-two")))
    assert(hits.select(col("system.path")).collect()
      .map(_.getString(0)).toSet == Set("/co/z"))
    val none = Search.run(store, Search.Request(path = "/co",
      descendants = true, qp = Some(s"$$${V1}title$$::z-two")))
    assert(none.count() == 0)
  }

  test("formatters reconstruct the original predicate IRIs") {
    import spark.implicits._
    val cur = store.current.where(col("system.path") === "/co/z")
    val nt = Formatters.ntriples(cur).as[String].collect()
    val preds = nt.flatMap(Rdf.parseLine(_)).map(_.pred).toSet
    assert(preds == Set(s"${V1}title", s"${V2}title"))
    // re-ingest lands on the SAME canonical keys (claims are stable)
    val inf2 = Ingest.ingest(spark, Ingest.emptyStore(spark),
      nt.toSeq.toDS(), java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))
    val keys2 = inf2.select(explode(map_keys(col("fields"))))
      .distinct().collect().map(_.getString(0)).toSet
    assert(keys2 == Set("title", "title.$" + Namespaces.hashOf(V2)))
    // ttl: bare key under ont: pname, qualified key as a full <iri>
    val ttl = Formatters.ttl(cur).as[String].collect().head
    assert(ttl.contains(s"<${V2}title>"))
    // rdfxml: generated prefix + xmlns declaration
    val (head, _) = Formatters.rdfxmlWrap
    val h2 = Namespaces.hashOf(V2)
    assert(head.contains(s"""xmlns:n$h2="${V2}""""))
    val xml = Formatters.rdfxml(cur).as[String].collect().head
    assert(xml.contains(s"<n$h2:title>z-two</n$h2:title>"))
    // full rdfxml document re-ingests to the same keys
    val (rh, rt) = Formatters.rdfxmlWrap
    val sts = graft.ingest.RdfXml.parse(rh + "\n" + xml + "\n" + rt)
    assert(sts.map(_.pred).toSet == Set(s"${V1}title", s"${V2}title"))
  }

  test("SPARQL distinguishes the two predicates by IRI") {
    val out = Sparql.select(store,
      s"""SELECT ?s ?t WHERE { ?s <${V2}title> ?t }""")
    val rows = out.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set("/co/y" -> "y-two", "/co/z" -> "z-two"))
  }
}
