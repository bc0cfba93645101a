package graft.qp

/** The qp filter algebra — runtime AST.
  *
  * Mirrors the reference's `cmwell.fts.FieldFilter` family (grammar:
  * server/cmwell-ws/app/Parsers.scala:511-633; runtime AST + compile:
  * server/cmwell-fts/src/main/scala/cmwell/fts/FTSService.scala:
  * 1809-1915). Re-expressed here as a plain ADT that compiles to a
  * Catalyst `Column` (see [[FilterCompiler]]) instead of an ES bool
  * query — the whole tree lands in ONE predicate that Catalyst pushes
  * into the Parquet scan.
  */
sealed trait FieldOp
object FieldOp {
  case object Must extends FieldOp
  case object MustNot extends FieldOp
  case object Should extends FieldOp
}

/** Value operators (FTSService.scala:895-903; qp tokens in parens). */
sealed trait ValueOp
object ValueOp {
  case object Contains extends ValueOp            // `:`  (match-phrase)
  case object Equals extends ValueOp              // `::` (exact term)
  case object GreaterThan extends ValueOp         // `>`
  case object GreaterThanOrEquals extends ValueOp // `>>`
  case object LessThan extends ValueOp            // `<`
  case object LessThanOrEquals extends ValueOp    // `<<`
  case object Like extends ValueOp                // `~`  (fuzzy)
}

sealed trait FieldFilter { def op: FieldOp }

/** One predicate on one (multi-valued) field. `value=None` means
  * field-existence (FTSService.scala:909-915). */
final case class SingleFieldFilter(op: FieldOp, valueOp: ValueOp,
    field: String, value: Option[String]) extends FieldFilter

/** Nested bool — `[...]` groups in qp (Parsers.scala:599-610). */
final case class MultiFieldFilter(op: FieldOp,
    filters: Seq[FieldFilter]) extends FieldFilter
