package graft

import graft.qp._
import org.scalatest.funsuite.AnyFunSuite

/** qp grammar (reference Parsers.scala:511-633 incl. the doctest cases
  * at :559-594). */
class QpParserSpec extends AnyFunSuite {

  test("single equals filter") {
    assert(QpParser.parse("mktsegment::BUILDING") ==
      SingleFieldFilter(FieldOp.Must, ValueOp.Equals, "mktsegment",
        Some("BUILDING")))
  }

  test("comma is AND of Must filters") {
    val f = QpParser.parse("a::1,b>2")
    assert(f == MultiFieldFilter(FieldOp.Must, List(
      SingleFieldFilter(FieldOp.Must, ValueOp.Equals, "a", Some("1")),
      SingleFieldFilter(FieldOp.Must, ValueOp.GreaterThan, "b", Some("2")))))
  }

  test("prefixes: - is MustNot, * is Should") {
    val f = QpParser.parse("-a::x,*b::y")
    val MultiFieldFilter(_, List(n, s)) = f: @unchecked
    assert(n.op == FieldOp.MustNot && s.op == FieldOp.Should)
  }

  test("two-char range ops win over one-char") {
    assert(QpParser.parse("a>>5").asInstanceOf[SingleFieldFilter].valueOp ==
      ValueOp.GreaterThanOrEquals)
    assert(QpParser.parse("a<<5").asInstanceOf[SingleFieldFilter].valueOp ==
      ValueOp.LessThanOrEquals)
  }

  test("empty value means existence") {
    assert(QpParser.parse("field:") ==
      SingleFieldFilter(FieldOp.Must, ValueOp.Contains, "field", None))
  }

  test("bracket group nests a bool") {
    val f = QpParser.parse("[*a::1,*b::2],c::3")
    val MultiFieldFilter(_, List(g, c)) = f: @unchecked
    assert(g.isInstanceOf[MultiFieldFilter])
    assert(g.asInstanceOf[MultiFieldFilter].filters.size == 2)
    assert(c.asInstanceOf[SingleFieldFilter].field == "c")
  }

  test("fuzzy and contains ops") {
    assert(QpParser.parse("a~xyz").asInstanceOf[SingleFieldFilter].valueOp ==
      ValueOp.Like)
    assert(QpParser.parse("a:xyz").asInstanceOf[SingleFieldFilter].valueOp ==
      ValueOp.Contains)
  }

  test("sort-by: - desc, * or bare asc, comma-separated") {
    assert(QpParser.parseSortBy("-acctbal,*name,path") ==
      Seq(("acctbal", false), ("name", true), ("path", true)))
  }

  test("quoted values carry commas, brackets and escaped quotes") {
    assert(QpParser.parse("name::\"Smith, John [Jr]\"") ==
      SingleFieldFilter(FieldOp.Must, ValueOp.Equals, "name",
        Some("Smith, John [Jr]")))
    assert(QpParser.parse("t::\"say \\\"hi\\\"\"") ==
      SingleFieldFilter(FieldOp.Must, ValueOp.Equals, "t",
        Some("say \"hi\"")))
    // quoted values compose inside groups and conjunctions
    val f = QpParser.parse("a::\"x,y\",b::plain")
    assert(f == MultiFieldFilter(FieldOp.Must, List(
      SingleFieldFilter(FieldOp.Must, ValueOp.Equals, "a", Some("x,y")),
      SingleFieldFilter(FieldOp.Must, ValueOp.Equals, "b", Some("plain")))))
    // quoted leading/trailing spaces survive (raw values trim)
    assert(QpParser.parse("a::\" padded \"") ==
      SingleFieldFilter(FieldOp.Must, ValueOp.Equals, "a", Some(" padded ")))
  }

  test("bad input throws with position") {
    val e = intercept[IllegalArgumentException](QpParser.parse("[unclosed"))
    assert(e.getMessage.contains("bad qp"))
  }
}
