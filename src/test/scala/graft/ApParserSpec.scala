package graft

import graft.ops.Aggregations._
import graft.qp.ApParser
import org.scalatest.funsuite.AnyFunSuite

/** `ap=` aggregation grammar (reference Parsers.scala:157-275). */
class ApParserSpec extends AnyFunSuite {

  test("term with size and exact field") {
    assert(ApParser.parse("type:term,field::orderstatus,size:3") ==
      Seq(TermAgg("orderstatus", "orderstatus", 3)))
  }

  test("name defaults to field; explicit name wins") {
    assert(ApParser.parse("type:stats,field::x").head.name == "x")
    assert(ApParser.parse("type:stats,field::x,name:s1").head.name == "s1")
  }

  test("nesting binds sub-aggregations to the bucket agg") {
    val Seq(t: TermAgg) = ApParser.parse(
      "type:term,field::a<type:stats,field::b>"): @unchecked
    assert(t.subs == Seq(StatsAgg("b", "b")))
  }

  test("deep nesting parses recursively") {
    val Seq(t: TermAgg) = ApParser.parse(
      "type:term,field::a<type:term,field::b,name:t2<type:card,field::c>>"): @unchecked
    val Seq(t2: TermAgg) = t.subs: @unchecked
    assert(t2.name == "t2" && t2.subs == Seq(CardAgg("c", "c", None)))
  }

  test("siblings split on tilde") {
    val specs = ApParser.parse("type:stats,field::a~type:card,field::b")
    assert(specs == Seq(StatsAgg("a", "a"), CardAgg("b", "b", None)))
  }

  test("hist carries interval and minDocCount") {
    assert(ApParser.parse(
      "type:hist,field::p,interval:50,minDocCount:2") ==
      Seq(HistAgg("p", "p", 50d, 2)))
  }

  test("unknown type throws") {
    intercept[IllegalArgumentException](
      ApParser.parse("type:bogus,field::x"))
  }

  test("sig carries backgroundTerm as field*value") {
    assert(ApParser.parse(
      "type:sig,field::props,backgroundTerm:event_type*click,size:5") ==
      Seq(SigTermsAgg("props", "props", 5, 1,
        Some(("event_type", "click")))))
    intercept[IllegalArgumentException](
      ApParser.parse("type:sig,field::p,backgroundTerm:noStar"))
  }
}
