package graft.qp

import scala.util.parsing.combinator.RegexParsers

/** Parser for the `qp` query-parameter language.
  *
  * Grammar re-derived from the reference's combinator grammar
  * (server/cmwell-ws/app/Parsers.scala:511-633):
  *
  *   qp      := filter ("," filter)*              -- "," is AND
  *   filter  := prefix? (group | single)
  *   prefix  := "-" (MustNot) | "*" (Should)      -- default Must
  *   group   := "[" qp "]"                        -- nested bool
  *   single  := field valueOp value? | field ":"  -- empty value = exists
  *   valueOp := "::" | ":" | ">>" | ">" | "<<" | "<" | "~"
  *
  * Also parses `sort-by` lists (Parsers.scala:734-757): comma-separated
  * field names, '-' prefix = descending, '*' (or none) = ascending.
  */
object QpParser extends RegexParsers {
  override def skipWhitespace = false

  /** Field keys admit the namespace-qualified spellings resolved by
    * [[Namespaces]]: `$full-uri$` (any chars between the `$`s, so the
    * IRI's `:`/`#`/`/` don't collide with valueOp), `local.prefix`,
    * `local.$hash`, plain `local`. */
  private def fieldName: Parser[String] =
    """\$[^$]+\$""".r | """[A-Za-z0-9_.$]+""".r

  private def valueOp: Parser[ValueOp] =
    ("::" ^^^ ValueOp.Equals) | (":" ^^^ ValueOp.Contains) |
    (">>" ^^^ ValueOp.GreaterThanOrEquals) | (">" ^^^ ValueOp.GreaterThan) |
    ("<<" ^^^ ValueOp.LessThanOrEquals) | ("<" ^^^ ValueOp.LessThan) |
    ("~" ^^^ ValueOp.Like)

  /** Values may be double-quoted to carry `,`/`[`/`]`/leading spaces
    * (reference grammar handles quoting, Parsers.scala:511-633);
    * backslash escapes any char inside quotes. Raw values keep the old
    * grammar (trimmed, empty = exists). */
  private def value: Parser[Option[String]] =
    (""""(?:[^"\\]|\\.)*"""".r ^^ { s =>
      Some(s.substring(1, s.length - 1).replaceAll("\\\\(.)", "$1"))
    }) |
    ("""[^,\[\]]*""".r ^^ (v => Option(v.trim).filter(_.nonEmpty)))

  private def prefix: Parser[FieldOp] =
    ("-" ^^^ FieldOp.MustNot) | ("*" ^^^ FieldOp.Should) | success(FieldOp.Must)

  private def single(op: FieldOp): Parser[FieldFilter] =
    fieldName ~ valueOp ~ value ^^ { case f ~ vo ~ v =>
      SingleFieldFilter(op, vo, f, v)
    }

  private def group(op: FieldOp): Parser[FieldFilter] =
    "[" ~> filters <~ "]" ^^ (fs => MultiFieldFilter(op, fs))

  private def filter: Parser[FieldFilter] =
    prefix >> (op => group(op) | single(op))

  private def filters: Parser[List[FieldFilter]] = rep1sep(filter, ",")

  /** Parse a qp expression into a single (conjunctive) filter tree. */
  def parse(qp: String): FieldFilter =
    parseAll(filters, qp) match {
      case Success(f :: Nil, _) => f
      case Success(fs, _) => MultiFieldFilter(FieldOp.Must, fs)
      case NoSuccess(msg, next) =>
        throw new IllegalArgumentException(
          s"bad qp '$qp' at ${next.pos.column}: $msg")
      case other => throw new IllegalArgumentException(other.toString)
    }

  /** sort-by: `-field` desc, `*field`/`field` asc, comma-separated. */
  def parseSortBy(s: String): Seq[(String, Boolean)] =
    s.split(",").toIndexedSeq.map(_.trim).filter(_.nonEmpty).map {
      case f if f.startsWith("-") => (f.drop(1), false)
      case f if f.startsWith("*") => (f.drop(1), true)
      case f => (f, true)
    }
}
