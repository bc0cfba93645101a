package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Turtle subset parsing (prefixes, `;`/`,` lists, typed/lang/shorthand
  * literals, `a`). */
class TurtleSpec extends AnyFunSuite {

  private val Doc =
    """@prefix ont: <cmwell://ont#> .
      |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
      |# a comment
      |<cmwell://customer/1> a ont:Customer ;
      |  ont:name "Alice \"A\" Smith"@en ;
      |  ont:acctbal "711.56"^^xsd:double ;
      |  ont:size 42 ;
      |  ont:ratio 0.5 ;
      |  ont:active true ;
      |  ont:refNation <cmwell://nation/3>, <cmwell://nation/4> .
      |ont:standalone ont:name "solo" .
      |""".stripMargin

  test("statements, lists and literal shapes all parse") {
    val sts = Turtle.parse(Doc)
    assert(sts.length == 9)
    val bySubj = sts.groupBy(_.subj)
    assert(bySubj.keySet ==
      Set("cmwell://customer/1", "cmwell://ont#standalone"))
    val c1 = bySubj("cmwell://customer/1")
    assert(c1.exists(s =>
      s.pred == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type" &&
      s.objIri.contains("cmwell://ont#Customer")))
    assert(c1.exists(s => s.lit.contains("Alice \"A\" Smith") &&
      s.lang.contains("en")))
    assert(c1.count(_.pred == "cmwell://ont#refNation") == 2)
    val typed = c1.map(Rdf.toValue)
    assert(typed.exists(v => v.vType == "d" && v.n.contains(711.56)))
    assert(typed.exists(v => v.vType == "l" && v.n.contains(42.0)))
    assert(typed.exists(v => v.vType == "d" && v.n.contains(0.5)))
    assert(typed.exists(v => v.vType == "b" && v.b.contains(true)))
  }

  test("exponent-form doubles and backslash-final literals parse") {
    val sts = Turtle.parse(
      """<c://x> <c://o#big> 1e5 ; <c://o#s> "tail\\" .""")
    assert(sts.exists(s => s.lit.contains("1e5") &&
      s.dtype.exists(_.endsWith("decimal"))))
    assert(sts.exists(_.lit.contains("tail\\")))
    assert(Rdf.toValue(sts.find(_.lit.contains("1e5")).get).n
      .contains(100000.0))
  }

  test("blank-node property lists expand to fresh bnode subjects") {
    val sts = Turtle.parse(
      "<c://a> <c://o#p> [ <c://o#q> \"x\" ; <c://o#r> 7 ] .")
    val link = sts.find(_.subj == "c://a").get
    val b = link.objIri.get
    assert(b.startsWith("_:"))
    val nested = sts.filter(_.subj == b)
    assert(nested.exists(s => s.pred == "c://o#q" && s.lit.contains("x")))
    assert(nested.exists(s => s.pred == "c://o#r" && s.lit.contains("7")))
    // bnode as subject with trailing predicate list
    val sts2 = Turtle.parse("[ <c://o#q> \"y\" ] <c://o#p> <c://b> .")
    assert(sts2.exists(s => s.pred == "c://o#q" && s.lit.contains("y")))
    assert(sts2.exists(s => s.pred == "c://o#p" && s.objIri.contains("c://b")))
    assert(sts2.map(_.subj).distinct.length == 1)
  }

  test("collections expand to rdf:first/rdf:rest chains") {
    val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val sts = Turtle.parse("<c://a> <c://o#list> ( 1 2 ) .")
    val head = sts.find(_.subj == "c://a").get.objIri.get
    val firsts = sts.filter(_.pred == RdfNs + "first")
    assert(firsts.map(_.lit.get).toSet == Set("1", "2"))
    val rests = sts.filter(_.pred == RdfNs + "rest")
    assert(rests.length == 2 &&
      rests.exists(_.objIri.contains(RdfNs + "nil")))
    assert(firsts.exists(_.subj == head))
    // empty collection is rdf:nil directly
    val nil = Turtle.parse("<c://a> <c://o#list> () .")
    assert(nil.head.objIri.contains(RdfNs + "nil"))
  }

  test("triple-quoted long literals parse with embedded newlines") {
    val sts = Turtle.parse(
      "<c://a> <c://o#text> \"\"\"line1\nline\"2\"\"\"@en .")
    assert(sts.head.lit.contains("line1\nline\"2"))
    assert(sts.head.lang.contains("en"))
  }

  test("blank-node labels are distinct across documents in one batch") {
    val d1 = "<c://a/1> <c://o#p> [ <c://o#q> \"x\" ] ."
    val d2 = "<c://a/2> <c://o#p> [ <c://o#q> \"y\" ] ."
    val b1 = Turtle.parse(d1).find(_.subj == "c://a/1").get.objIri.get
    val b2 = Turtle.parse(d2).find(_.subj == "c://a/2").get.objIri.get
    assert(b1 != b2, "per-document counters must not collide in a batch")
    // deterministic: re-parsing the same document yields the same label
    assert(Turtle.parse(d1).find(_.subj == "c://a/1").get.objIri.get == b1)
  }

  test("unresolved single-colon prefixes throw instead of leaking") {
    val e = intercept[IllegalArgumentException](
      Turtle.parse("<c://a> ontt:name \"x\" ."))
    assert(e.getMessage.contains("unresolved prefix"))
    // genuinely scheme-qualified tokens still pass through
    val ok = Turtle.parse("<c://a> cmwell://meta/sys#markReplace <c://o#f> .")
    assert(ok.head.pred == "cmwell://meta/sys#markReplace")
  }

  test("trig graph blocks tag statements with the path-normalized graph") {
    val doc =
      """@prefix ont: <cmwell://ont#> .
        |<c://s/1> ont:plain "outside" .
        |GRAPH <c://graph/g1> {
        |  <c://s/1> ont:tagged "in-g1" .
        |  <c://s/2> ont:tagged "also-g1"
        |}
        |<c://graph/g2> { <c://s/1> ont:tagged "in-g2" . }
        |{ <c://s/1> ont:dflt "default-block" . }
        |""".stripMargin
    val sts = Turtle.parse(doc)
    def quadOf(lit: String) = sts.find(_.lit.contains(lit)).get.quad
    assert(quadOf("outside").isEmpty)
    assert(quadOf("in-g1").contains("/graph/g1"))
    assert(quadOf("also-g1").contains("/graph/g1")) // final '.' omitted
    assert(quadOf("in-g2").contains("/graph/g2"))
    assert(quadOf("default-block").isEmpty)
  }

  test("bare subject with no predicate-object list fails loud") {
    // inside a TriG block: a dangling IRI before '}' must not be
    // silently swallowed
    val e = intercept[IllegalArgumentException](
      Turtle.parse("<c://g/1> { <c://s/1> }"))
    assert(e.getMessage.contains("no predicate-object list"))
    // top level: a dangling IRI before '.' is equally a syntax error
    val e2 = intercept[IllegalArgumentException](
      Turtle.parse("<c://s/1> ."))
    assert(e2.getMessage.contains("no predicate-object list"))
    // a standalone blank-node property list remains legal (grammar [6])
    assert(Turtle.parse("[ <c://o#p> \"x\" ] .").nonEmpty)
  }

  test("N3 entry reads Turtle, rejects N3-proper syntax fail-loud") {
    // the Turtle subset parses identically through the N3 entry
    val doc = """@prefix ont: <cmwell://ont#> .
      |<c://n/1> ont:tag "v" ; ont:note "uses => inside a literal" .
      |<c://n/1> ont:ref <c://x/a=b> .
      |""".stripMargin
    assert(Turtle.parseN3(doc) == Turtle.parse(doc))
    // quantifiers, implication, @keywords: detected before parse
    for (bad <- Seq(
      "@forAll <c://x/v> .",
      "@forSome <c://x/v> .",
      "@keywords a .",
      "{ <c://s/1> <c://o#p> \"x\" . } => { <c://s/1> <c://o#q> \"y\" . } .",
      // '<=' followed by IRIs: a greedy IRI scrub would swallow the
      // marker ('<' of '<=' through the next IRI's '>') and let the
      // formula through — the scrub must not cross whitespace
      "{ <c://s/1> <c://o#p> <c://o2> . } <= { <c://s/2> <c://o#q> <c://o3> . } ."))
      assert(intercept[IllegalArgumentException](Turtle.parseN3(bad))
        .getMessage.contains("N3-proper"))
    // markers inside literals or IRIs do NOT false-positive
    assert(Turtle.parseN3(
      """<c://s/1> <c://o#p> "a => b", "x @forAll y" .""").length == 2)
  }

  test("turtle ingest lands searchable infotons") {
    val spark = graft.SparkSuite.session
    import spark.implicits._
    val inf = Ingest.ingestTurtle(spark, Ingest.emptyStore(spark),
      Seq(Doc).toDS(), java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    val store = graft.model.GraftStore.fromInfotons(spark, inf)
    val hit = graft.ops.Search.run(store,
      graft.ops.Search.Request(path = "/customer", qp = Some("active::true")))
    assert(hit.count() == 1)
    assert(hit.select("system.path").head().getString(0) == "/customer/1")
  }
}
