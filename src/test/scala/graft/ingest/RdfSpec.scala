package graft.ingest

import graft.model.InfotonModel._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** N-Triples/N-Quads parsing and RDF→command folding (reference
  * LDFormatParser.rdfToInfotonsMap:586-605). */
class RdfSpec extends AnyFunSuite {
  private val T = Timestamp.valueOf("2026-01-01 00:00:00")

  test("iri to path strips scheme") {
    assert(Rdf.iriToPath("https://example.org/a/b") == "/example.org/a/b")
    assert(Rdf.iriToPath("cmwell://customer/1") == "/customer/1")
    assert(Rdf.iriToPath("/already/path") == "/already/path")
  }

  test("local name after # or /") {
    assert(Rdf.localName("cmwell://ont#custkey") == "custkey")
    assert(Rdf.localName("http://xmlns.com/foaf/0.1/name") == "name")
  }

  test("plain triple with IRI object") {
    val Some(st) = Rdf.parseLine(
      "<cmwell://customer/1> <cmwell://ont#refNation> <cmwell://nation/3> ."): @unchecked
    assert(st.subj == "cmwell://customer/1")
    assert(st.objIri.contains("cmwell://nation/3"))
    val v = Rdf.toValue(st)
    assert(v.vType == TRef && v.s == "/nation/3")
  }

  test("typed literals land in the right slots") {
    val long = Rdf.toValue(Rdf.parseLine(
      """<c://a> <c://o#k> "42"^^<http://www.w3.org/2001/XMLSchema#long> .""").get)
    assert(long.vType == TLong && long.n.contains(42.0) && long.s == "42")
    val dbl = Rdf.toValue(Rdf.parseLine(
      """<c://a> <c://o#k> "1.5"^^<http://www.w3.org/2001/XMLSchema#double> .""").get)
    assert(dbl.vType == TDouble && dbl.n.contains(1.5))
    val b = Rdf.toValue(Rdf.parseLine(
      """<c://a> <c://o#k> "true"^^<http://www.w3.org/2001/XMLSchema#boolean> .""").get)
    assert(b.vType == TBool && b.b.contains(true))
    val d = Rdf.toValue(Rdf.parseLine(
      """<c://a> <c://o#k> "2024-06-01T10:00:00Z"^^<http://www.w3.org/2001/XMLSchema#dateTime> .""").get)
    assert(d.vType == TDate && d.t.nonEmpty)
  }

  test("language tags and escapes") {
    val v = Rdf.toValue(Rdf.parseLine(
      """<c://a> <c://o#k> "Gr\u00FC\tze \"quoted\""@de .""").get)
    assert(v.lang.contains("de"))
    assert(v.s == "Gr\u00fc\tze \"quoted\"")
  }

  test("N-Quads graph term becomes the value quad, in path form") {
    val Some(st) = Rdf.parseLine(
      "<c://a> <c://o#k> <c://b> <c://graph/g1> ."): @unchecked
    assert(st.quad.contains("/graph/g1"))
  }

  test("literal ending in an escaped backslash parses") {
    val Some(st) = Rdf.parseLine(
      """<c://a> <c://o#k> "ends with \\" ."""): @unchecked
    assert(st.lit.contains("ends with \\"))
  }

  test("timezone-less xsd:dateTime parses as UTC") {
    val v = Rdf.toValue(Rdf.parseLine(
      """<c://a> <c://o#k> "2026-01-15T10:30:00"^^<http://www.w3.org/2001/XMLSchema#dateTime> .""").get)
    assert(v.vType == TDate)
    assert(v.t.get.toInstant ==
      java.time.Instant.parse("2026-01-15T10:30:00Z"))
  }

  test("comments and blanks skipped") {
    assert(Rdf.parseLine("# comment").isEmpty)
    assert(Rdf.parseLine("   ").isEmpty)
  }

  test("subject statements fold into one write command") {
    val sts = Seq(
      "<c://x/1> <c://o#a> \"v1\" .",
      "<c://x/1> <c://o#a> \"v2\" .",
      "<c://x/1> <c://o#b> \"w\" .").flatMap(Rdf.parseLine)
    val cmd = Rdf.toCommand("/x/1", sts, T)
    assert(cmd.op == "write")
    assert(cmd.fields("a").map(_.s).toSet == Set("v1", "v2"))
    assert(cmd.fields("b").map(_.s) == Seq("w"))
  }

  test("markReplace directive makes an update with whole-field delete") {
    val sts = Seq(
      s"<c://x/1> <${Rdf.SysNs}markReplace> <c://o#a> .",
      "<c://x/1> <c://o#a> \"new\" .").flatMap(Rdf.parseLine)
    val cmd = Rdf.toCommand("/x/1", sts, T)
    assert(cmd.op == "update")
    assert(cmd.deleteFields == Map("a" -> Seq.empty))
    assert(cmd.fields("a").map(_.s) == Seq("new"))
  }

  test("fullDelete directive makes a path tombstone command") {
    val sts = Seq(s"""<c://x/1> <${Rdf.SysNs}fullDelete> "true" .""")
      .flatMap(Rdf.parseLine)
    assert(Rdf.toCommand("/x/1", sts, T).op == "delete_path")
  }
}
