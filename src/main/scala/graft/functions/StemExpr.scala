package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native full-Porter stem — one static call per token.
  *
  * Why a custom expression (escalation path (b), the [[GramRunStats]]
  * rationale): the Column formulation of the 48-rule full-Porter fold
  * is 48 chained `regexp_replace` nodes; each node pays a
  * UTF8String→String→UTF8String round-trip and its own expression
  * overhead per token, and the chain bloats the generated method for
  * whatever projection contains it. Here the rule table is compiled
  * ONCE per JVM ([[StemFull.Rules]]) and the whole fold is one tight
  * loop; the row stays inside whole-stage codegen with one call per
  * token. Driver and executor CANNOT drift: `TextAnalyzer.stemFull`
  * delegates to the same [[StemFull.stemString]] this expression
  * calls.
  */
case class StemFullExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "stem_full"
  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    StemFull.stem(v.asInstanceOf[UTF8String])

  // one static call per token — the fold body lives in compiled Scala
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StemFull.stem($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object StemFull {
  /** The shared full-Porter table ([[graft.qp.TextAnalyzer.FullStemRules]])
    * precompiled once per JVM. */
  private lazy val Rules: Array[(java.util.regex.Pattern, String)] =
    graft.qp.TextAnalyzer.FullStemRules.map { case (p, r) =>
      java.util.regex.Pattern.compile(p) -> r
    }.toArray

  /** Called once per token from generated code. */
  def stem(s: UTF8String): UTF8String =
    UTF8String.fromString(stemString(s.toString))

  /** The ONE full-Porter implementation — the driver-side
    * `TextAnalyzer.stemFull` and the executor expression both run
    * this loop. */
  def stemString(t: String): String = StemRunner.run(Rules, t)
}

/** Same shape for the Porter-LITE table (the [[graft.qp.TextAnalyzer.English]]
  * default chain) — one static call per token instead of 11 chained
  * regexp_replace nodes. */
case class StemLiteExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "stem_lite"
  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    StemLite.stem(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StemLite.stem($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object StemLite {
  private lazy val Rules: Array[(java.util.regex.Pattern, String)] =
    graft.qp.TextAnalyzer.StemRules.map { case (p, r) =>
      java.util.regex.Pattern.compile(p) -> r
    }.toArray

  def stem(s: UTF8String): UTF8String =
    UTF8String.fromString(stemString(s.toString))

  /** The ONE Porter-lite implementation — `TextAnalyzer.stem` and the
    * executor expression both run this loop. */
  def stemString(t: String): String = StemRunner.run(Rules, t)
}

/** Same shape for the light-GERMAN table (the
  * [[graft.qp.TextAnalyzer.German]] chain) — one static call per token. */
case class StemDeExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "stem_de"
  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    StemDe.stem(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StemDe.stem($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object StemDe {
  private lazy val Rules: Array[(java.util.regex.Pattern, String)] =
    graft.qp.TextAnalyzer.GermanStemRules.map { case (p, r) =>
      java.util.regex.Pattern.compile(p) -> r
    }.toArray

  def stem(s: UTF8String): UTF8String =
    UTF8String.fromString(stemString(s.toString))

  /** The ONE light-German implementation — `TextAnalyzer.stemDe` and
    * the executor expression both run this loop. */
  def stemString(t: String): String = StemRunner.run(Rules, t)
}

/** French token→term — the WHOLE per-token chain (elision strip,
  * apostrophe drop, stop-gap, minimal stem) as one static call, the
  * [[graft.qp.TextAnalyzer.French]] executor side. One combined
  * function rather than mirrored Column stages because elision makes
  * the chain multi-stage per token: a single shared implementation is
  * drift-free by construction. */
case class FrTermExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "fr_term"
  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    FrTerm.termU(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FrTerm.termU($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object FrTerm {
  private lazy val Stops = graft.qp.TextAnalyzer.FrenchStopWords
  private lazy val Elisions = graft.qp.TextAnalyzer.FrenchElisions

  def termU(s: UTF8String): UTF8String = UTF8String.fromString(term(s.toString))

  /** The ONE French per-token chain — driver `queryTokens` and the
    * executor expression both run this. Input: a lowercase French
    * letter/digit/apostrophe run. Output: the index term, the
    * position-gap sentinel for stop words, or "" for tokens that
    * normalize away entirely (both sides filter those out before
    * positions are assigned). */
  def term(tok: String): String = {
    // elision strip at the FIRST apostrophe of either kind
    var t = tok
    val i1 = t.indexOf('\''); val i2 = t.indexOf('’')
    val ap = if (i1 < 0) i2 else if (i2 < 0) i1 else math.min(i1, i2)
    if (ap > 0 && ap < t.length - 1 && Elisions.contains(t.substring(0, ap)))
      t = t.substring(ap + 1)
    // interior apostrophes are orthographic (aujourd'hui) — drop them
    t = t.filterNot(c => c == '\'' || c == '’')
    if (t.isEmpty) return ""
    if (Stops.contains(t)) return graft.qp.TextAnalyzer.PositionGap
    stem(t)
  }

  /** Savoy's French minimal stemmer (the Lucene
    * FrenchMinimalStemFilter algorithm): tokens shorter than 6 chars
    * pass through; -aux → -al; else a trailing x drops; else trailing
    * s, then r, then e, then é drop in sequence; a final doubled
    * letter collapses. */
  def stem(t: String): String = {
    if (t.length < 6) return t
    if (t.last == 'x')
      return if (t.endsWith("aux")) t.dropRight(2) + "l" else t.dropRight(1)
    var w = t
    if (w.last == 's') w = w.dropRight(1)
    if (w.last == 'r') w = w.dropRight(1)
    if (w.last == 'e') w = w.dropRight(1)
    if (w.last == 'é') w = w.dropRight(1)
    if (w.length >= 2 && w.last == w(w.length - 2)) w = w.dropRight(1)
    w
  }
}

/** Spanish token→term — stop-gap + light stem as one static call, the
  * [[graft.qp.TextAnalyzer.Spanish]] executor side. Combined like
  * [[FrTerm]] (not a regex fold like German) because the published
  * algorithm is conditional character surgery — a length gate BEFORE
  * accent folding, then suffix dispatch on the last characters — that
  * regex rules would state less clearly than ten lines of code. */
case class EsTermExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "es_term"
  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    EsTerm.termU(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.EsTerm.termU($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object EsTerm {
  private lazy val Stops = graft.qp.TextAnalyzer.SpanishStopWords

  def termU(s: UTF8String): UTF8String = UTF8String.fromString(term(s.toString))

  /** The ONE Spanish per-token chain — driver `queryTokens` and the
    * executor expression both run this. Stop check runs on the RAW
    * folded token (the set carries accented forms — "más", "él"),
    * before stemming, like the English/German chains. */
  def term(tok: String): String = {
    if (Stops.contains(tok)) return graft.qp.TextAnalyzer.PositionGap
    stem(tok)
  }

  /** Light Spanish stemmer (Savoy 2006 — the published algorithm
    * behind Lucene's SpanishLightStemFilter): tokens shorter than 5
    * chars pass through UNTOUCHED (accents included — "más" keeps
    * its á); otherwise accented vowels fold to their base, then one
    * suffix rule fires: trailing o/a/e drops; -os/-as/-es drops both;
    * -ces → -z (veces → vez); -eses → -es. Anything else passes. */
  def stem(t: String): String = {
    if (t.length < 5) return t
    val w = t.map {
      case 'à' | 'á' | 'â' | 'ä' => 'a'
      case 'è' | 'é' | 'ê' | 'ë' => 'e'
      case 'ì' | 'í' | 'î' | 'ï' => 'i'
      case 'ò' | 'ó' | 'ô' | 'ö' => 'o'
      case 'ù' | 'ú' | 'û' | 'ü' => 'u'
      case c => c
    }
    val n = w.length
    w(n - 1) match {
      case 'o' | 'a' | 'e' => w.substring(0, n - 1)
      case 's' =>
        if (w(n - 2) == 'e' && w(n - 3) == 's' && w(n - 4) == 'e')
          w.substring(0, n - 2)
        else if (w(n - 2) == 'e' && w(n - 3) == 'c')
          w.substring(0, n - 3) + "z"
        else if (w(n - 2) == 'o' || w(n - 2) == 'a' || w(n - 2) == 'e')
          w.substring(0, n - 2)
        else w
      case _ => w
    }
  }
}

private object StemRunner {
  def run(rules: Array[(java.util.regex.Pattern, String)],
          t: String): String = {
    var w = t
    var i = 0
    while (i < rules.length) {
      w = rules(i)._1.matcher(w).replaceAll(rules(i)._2)
      i += 1
    }
    w
  }
}
