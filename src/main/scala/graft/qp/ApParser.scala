package graft.qp

import graft.ops.Aggregations._
import scala.util.parsing.combinator.RegexParsers

/** Parser for the `ap=` aggregation-parameter language.
  *
  * Grammar re-derived from the reference (Parsers.scala:157-275):
  * comma-separated `key:value` pairs describe one aggregation;
  * `field::name` selects the exact (keyword) form vs `field:name`
  * analyzed (AggregationFilter.scala:33-36 — both route to the same
  * typed slot in this engine); `<...>` nests sub-aggregations inside
  * a bucket aggregation; `~` separates sibling aggregations.
  *
  * Example: `type:term,field::orderstatus,size:3<type:stats,field::totalprice>`
  */
object ApParser extends RegexParsers {
  override def skipWhitespace = false

  private def key: Parser[String] = """[A-Za-z_-]+""".r
  private def value: Parser[String] = """[^,<>~]+""".r
  private def pair: Parser[(String, String)] =
    key ~ ("::" | ":") ~ value ^^ { case k ~ sep ~ v =>
      (if (k == "field" && sep == "::") "field!" else k, v)
    }

  private def agg: Parser[AggSpec] =
    rep1sep(pair, ",") ~ opt("<" ~> rep1sep(agg, "~") <~ ">") ^^ {
      case pairs ~ subs => build(pairs.toMap, subs.getOrElse(Nil))
    }

  private def aggs: Parser[List[AggSpec]] = rep1sep(agg, "~")

  private def build(p: Map[String, String], subs: Seq[AggSpec]): AggSpec = {
    val field = p.getOrElse("field!", p.getOrElse("field",
      throw new IllegalArgumentException("ap: missing field")))
    val name = p.getOrElse("name", field)
    p.getOrElse("type", "term") match {
      case "term" =>
        TermAgg(name, field, p.get("size").map(_.toInt).getOrElse(10), subs)
      case "stats" => StatsAgg(name, field)
      case "hist" => HistAgg(name, field,
        p.get("interval").map(_.toDouble).getOrElse(1d),
        p.get("minDocCount").map(_.toInt).getOrElse(1),
        p.get("extMin").map(_.toDouble), p.get("extMax").map(_.toDouble),
        subs)
      case "card" => CardAgg(name, field,
        p.get("precisionThreshold").map(_.toLong))
      case "sig" => SigTermsAgg(name, field,
        p.get("size").map(_.toInt).getOrElse(10),
        p.get("minDocCount").map(_.toInt).getOrElse(1),
        // reference grammar: `backgroundTerm:field*value`
        // (Parsers.scala:207)
        p.get("backgroundTerm").map { s =>
          val i = s.indexOf('*')
          require(i > 0, s"backgroundTerm needs field*value, got '$s'")
          (s.take(i), s.drop(i + 1))
        })
      case t => throw new IllegalArgumentException(s"ap: unknown type $t")
    }
  }

  def parse(ap: String): Seq[AggSpec] = parseAll(aggs, ap) match {
    case Success(list, _) => list
    case other => throw new IllegalArgumentException(
      s"bad ap '$ap': $other")
  }
}
