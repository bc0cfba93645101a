package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** JSON-LD subset parsing: @context resolution, typed/lang values,
  * nested nodes, named graphs, fail-loud unknowns. */
class JsonLdSpec extends AnyFunSuite {

  test("context prefixes, typed values, references and @type parse") {
    val sts = JsonLd.parse(
      """{
        |  "@context": {"ont": "cmwell://ont#",
        |               "name": "cmwell://ont#name",
        |               "@vocab": "cmwell://vocab#"},
        |  "@id": "cmwell://customer/1",
        |  "@type": "ont:Customer",
        |  "name": [{"@value": "Alice", "@language": "en"}],
        |  "ont:acctbal": {"@value": "711.56",
        |    "@type": "http://www.w3.org/2001/XMLSchema#double"},
        |  "ont:size": 42,
        |  "ont:active": true,
        |  "ont:refNation": {"@id": "cmwell://nation/3"},
        |  "bare": "vocab-resolved"
        |}""".stripMargin)
    val bySubj = sts.groupBy(_.subj)
    assert(bySubj.keySet == Set("cmwell://customer/1"))
    val c = bySubj("cmwell://customer/1")
    assert(c.exists(s =>
      s.pred == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type" &&
        s.objIri.contains("cmwell://ont#Customer")))
    assert(c.exists(s => s.pred == "cmwell://ont#name" &&
      s.lit.contains("Alice") && s.lang.contains("en")))
    assert(c.exists(s => s.pred == "cmwell://vocab#bare" &&
      s.lit.contains("vocab-resolved")))
    val typed = c.filter(_.pred != "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
      .map(Rdf.toValue)
    assert(typed.exists(v => v.vType == "d" && v.n.contains(711.56)))
    assert(typed.exists(v => v.vType == "l" && v.n.contains(42.0)))
    assert(typed.exists(v => v.vType == "b" && v.b.contains(true)))
    assert(typed.exists(v => v.vType == "r" && v.s == "/nation/3"))
  }

  test("arrays, nested blank nodes and top-level arrays expand") {
    val sts = JsonLd.parse(
      """[{"@id": "c://a/1",
        |  "c://o#tag": ["x", "y"],
        |  "c://o#addr": {"c://o#city": "Berlin"}},
        | {"@id": "c://a/2", "c://o#tag": "z"}]""".stripMargin)
    assert(sts.count(s => s.subj == "c://a/1" && s.pred == "c://o#tag") == 2)
    val ref = sts.find(s => s.subj == "c://a/1" && s.pred == "c://o#addr").get
    val b = ref.objIri.get
    assert(b.startsWith("_:"))
    assert(sts.exists(s => s.subj == b && s.pred == "c://o#city" &&
      s.lit.contains("Berlin")))
    assert(sts.exists(s => s.subj == "c://a/2" && s.lit.contains("z")))
  }

  test("named @graph quad-tags nested statements") {
    val sts = JsonLd.parse(
      """{"@id": "c://g/1", "@graph": [
        |  {"@id": "c://d/1", "c://o#p": "v"}]}""".stripMargin)
    val st = sts.find(_.subj == "c://d/1").get
    assert(st.quad.contains("/g/1"))
  }

  test("@type:@id coercion turns string values into references") {
    val sts = JsonLd.parse(
      """{"@context": {"ref": {"@id": "c://o#ref", "@type": "@id"},
        |              "plain": "c://o#plain"},
        | "@id": "c://x/1", "ref": "c://y/1", "plain": "c://y/1"}""".stripMargin)
    val ref = sts.find(_.pred == "c://o#ref").get
    assert(ref.objIri.contains("c://y/1") && ref.lit.isEmpty)
    val plain = sts.find(_.pred == "c://o#plain").get
    assert(plain.lit.contains("c://y/1") && plain.objIri.isEmpty)
  }

  test("blank-node labels are distinct across documents in one batch") {
    def b(doc: String) =
      JsonLd.parse(doc).find(_.pred == "c://o#addr").get.objIri.get
    val b1 = b("""{"@id": "c://a/1", "c://o#addr": {"c://o#city": "X"}}""")
    val b2 = b("""{"@id": "c://a/2", "c://o#addr": {"c://o#city": "Y"}}""")
    assert(b1 != b2)
  }

  test("unresolvable keys and @list throw") {
    intercept[IllegalArgumentException](
      JsonLd.parse("""{"@id": "c://a/1", "typo:name": "x"}"""))
    intercept[IllegalArgumentException](
      JsonLd.parse("""{"@id": "c://a/1", "c://o#l": {"@list": ["a"]}}"""))
    // no @vocab → bare keys are unresolvable
    intercept[IllegalArgumentException](
      JsonLd.parse("""{"@id": "c://a/1", "bare": "x"}"""))
  }
}
