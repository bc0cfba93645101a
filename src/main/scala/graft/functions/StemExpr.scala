package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared shape of the per-token native analyzer expressions:
  * string → string, ONE static call per token into a chain
  * precompiled once per JVM.
  *
  * Why custom expressions at all (escalation path (b), the
  * [[GramRunStats]] rationale): the Column formulation of a stem
  * chain is N chained `regexp_replace` nodes (48 for full Porter);
  * each node pays a UTF8String→String→UTF8String round-trip and its
  * own expression overhead per token, and the chain bloats the
  * generated method of whatever projection contains it. Here the
  * whole chain is one tight compiled loop; the row stays inside
  * whole-stage codegen with one call per token. Driver and executor
  * CANNOT drift: each chain's driver-side entry point delegates to
  * the same static function the generated code calls. */
abstract class TokenFnExpr extends UnaryExpression {
  /** Fully-qualified static method the generated code calls — must
    * take and return UTF8String (null-safety comes from
    * nullSafeCodeGen). */
  protected def staticCall: String
  /** The same function, for interpreted (non-codegen) eval. */
  protected def run(s: UTF8String): UTF8String

  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = run(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $staticCall($c);")
}

/** Native full-Porter stem — steps 1-5 of the published algorithm as
  * one precompiled regex fold ([[StemFull]]). */
case class StemFullExpr(child: Expression) extends TokenFnExpr {
  override def prettyName: String = "stem_full"
  protected def staticCall: String = "graft.functions.StemFull.stem"
  protected def run(s: UTF8String): UTF8String = StemFull.stem(s)
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

/** Same shape for the Porter-LITE table (the
  * [[graft.qp.TextAnalyzer.English]] default chain). */
case class StemLiteExpr(child: Expression) extends TokenFnExpr {
  override def prettyName: String = "stem_lite"
  protected def staticCall: String = "graft.functions.StemLite.stem"
  protected def run(s: UTF8String): UTF8String = StemLite.stem(s)
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
  * [[graft.qp.TextAnalyzer.German]] chain). */
case class StemDeExpr(child: Expression) extends TokenFnExpr {
  override def prettyName: String = "stem_de"
  protected def staticCall: String = "graft.functions.StemDe.stem"
  protected def run(s: UTF8String): UTF8String = StemDe.stem(s)
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
case class FrTermExpr(child: Expression) extends TokenFnExpr {
  override def prettyName: String = "fr_term"
  protected def staticCall: String = "graft.functions.FrTerm.termU"
  protected def run(s: UTF8String): UTF8String = FrTerm.termU(s)
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
case class EsTermExpr(child: Expression) extends TokenFnExpr {
  override def prettyName: String = "es_term"
  protected def staticCall: String = "graft.functions.EsTerm.termU"
  protected def run(s: UTF8String): UTF8String = EsTerm.termU(s)
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

/** Italian token→term — the WHOLE per-token chain (elision strip,
  * apostrophe drop, stop-gap, light stem) as one static call, the
  * [[graft.qp.TextAnalyzer.Italian]] executor side. Combined like
  * [[FrTerm]] because Italian shares French's elision stage
  * (l'amico, dell'arte): the multi-stage per-token pipeline runs as
  * ONE shared implementation so driver and executor cannot drift. */
case class ItTermExpr(child: Expression) extends TokenFnExpr {
  override def prettyName: String = "it_term"
  protected def staticCall: String = "graft.functions.ItTerm.termU"
  protected def run(s: UTF8String): UTF8String = ItTerm.termU(s)
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object ItTerm {
  private lazy val Stops = graft.qp.TextAnalyzer.ItalianStopWords
  private lazy val Elisions = graft.qp.TextAnalyzer.ItalianElisions

  def termU(s: UTF8String): UTF8String = UTF8String.fromString(term(s.toString))

  /** The ONE Italian per-token chain — driver `queryTokens` and the
    * executor expression both run this. Same stage order as
    * [[FrTerm.term]]: elision strip → apostrophe drop → stop check
    * (raw folded token, accented forms in the set) → light stem. */
  def term(tok: String): String = {
    var t = tok
    val i1 = t.indexOf('\''); val i2 = t.indexOf('’')
    val ap = if (i1 < 0) i2 else if (i2 < 0) i1 else math.min(i1, i2)
    if (ap > 0 && ap < t.length - 1 && Elisions.contains(t.substring(0, ap)))
      t = t.substring(ap + 1)
    t = t.filterNot(c => c == '\'' || c == '’')
    if (t.isEmpty) return ""
    if (Stops.contains(t)) return graft.qp.TextAnalyzer.PositionGap
    stem(t)
  }

  /** Light Italian stemmer (Savoy 2006 — the published algorithm
    * behind Lucene's ItalianLightStemFilter): tokens shorter than 6
    * chars pass through untouched (accents included); otherwise
    * accented vowels fold to their base, then ONE final-vowel rule
    * fires — Italian plurals are vowel-final: trailing -e/-i/-a/-o
    * drops, taking a preceding i (gatti→gatt, case→cas, studie→stud)
    * or the h of a hard-consonant spelling (banche→banc, fichi→fic)
    * with it. Consonant-final tokens (loanwords) pass unchanged. */
  def stem(t: String): String = {
    if (t.length < 6) return t
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
      case 'e' =>
        if (w(n - 2) == 'i' || w(n - 2) == 'h') w.substring(0, n - 2)
        else w.substring(0, n - 1)
      case 'i' =>
        if (w(n - 2) == 'h' || w(n - 2) == 'i') w.substring(0, n - 2)
        else w.substring(0, n - 1)
      case 'a' =>
        if (w(n - 2) == 'i') w.substring(0, n - 2)
        else w.substring(0, n - 1)
      case 'o' =>
        if (w(n - 2) == 'i') w.substring(0, n - 2)
        else w.substring(0, n - 1)
      case _ => w
    }
  }
}

/** Portuguese token→term — stop-gap + light stem as one static call,
  * the [[graft.qp.TextAnalyzer.Portuguese]] executor side. Combined
  * like [[EsTerm]] (no elision stage) because the published recipe is
  * conditional character surgery — a staged plural reduction whose
  * rules REWRITE characters (-ns→-m, -ais→-al, -ões→-ão), a feminine
  * normalization, a final-vowel drop, then the accent fold LAST (the
  * plural rules must still see ã/ó/é) — which regex rules would state
  * less clearly than the direct transcription below. */
case class PtTermExpr(child: Expression) extends TokenFnExpr {
  override def prettyName: String = "pt_term"
  protected def staticCall: String = "graft.functions.PtTerm.termU"
  protected def run(s: UTF8String): UTF8String = PtTerm.termU(s)
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object PtTerm {
  private lazy val Stops = graft.qp.TextAnalyzer.PortugueseStopWords

  def termU(s: UTF8String): UTF8String = UTF8String.fromString(term(s.toString))

  /** The ONE Portuguese per-token chain — driver `queryTokens` and the
    * executor expression both run this. Stop check runs on the RAW
    * folded token (the set carries accented forms — "não", "é",
    * "também"), before stemming, like the Spanish chain. */
  def term(tok: String): String = {
    if (Stops.contains(tok)) return graft.qp.TextAnalyzer.PositionGap
    stem(tok)
  }

  /** Light Portuguese stemmer (Savoy 2006 — the published recipe
    * behind Lucene's PortugueseLightStemFilter): tokens shorter than 4
    * chars pass through; otherwise (1) PLURAL reduction — the written
    * plural alternations, longest/most-specific first: -es after
    * r/s/l/z drops the -es; -ns → -m (bens→bem); -éis/-eis → -el
    * (papéis→papel); -ais → -al (animais→animal); -óis → -ol
    * (lençóis→lençol); other -is → -il (barris→barril); -ões/-ães →
    * -ão (corações→coração); -mente drops (len>6); any other final -s
    * drops — then (2) FEMININE normalization on long -a tokens
    * (-inha/-eira→-o len>7; -osa/-ica/-ida/-ada/-iva→-o, -ora→-or,
    * -esa→-ês, -na→-no len>6), (3) the final theme vowel a/e/o drops
    * (len>4), and (4) accents fold to base letters (ç→c) LAST, so the
    * plural rules above still see their accented spellings. */
  def stem(t: String): String = {
    if (t.length < 4) return t
    var w = removePlural(t)
    if (w.length > 3 && w.last == 'a') w = normFeminine(w)
    if (w.length > 4 && (w.last == 'a' || w.last == 'e' || w.last == 'o'))
      w = w.dropRight(1)
    w.map {
      case 'á' | 'â' | 'ã' | 'à' => 'a'
      case 'é' | 'ê' => 'e'
      case 'í' => 'i'
      case 'ó' | 'ô' | 'õ' => 'o'
      case 'ú' | 'ü' => 'u'
      case 'ç' => 'c'
      case c => c
    }
  }

  private def removePlural(t: String): String = {
    val n = t.length
    if (n > 4 && t.endsWith("es") &&
        (t(n - 3) == 'r' || t(n - 3) == 's' || t(n - 3) == 'l' ||
         t(n - 3) == 'z')) return t.dropRight(2)
    if (n > 3 && t.endsWith("ns")) return t.dropRight(2) + "m"
    if (n > 4 && (t.endsWith("eis") || t.endsWith("éis")))
      return t.dropRight(3) + "el"
    if (n > 4 && t.endsWith("ais")) return t.dropRight(3) + "al"
    if (n > 4 && t.endsWith("óis")) return t.dropRight(3) + "ol"
    if (n > 4 && t.endsWith("is")) return t.dropRight(2) + "il"
    if (n > 3 && (t.endsWith("ões") || t.endsWith("ães")))
      return t.dropRight(3) + "ão"
    if (n > 6 && t.endsWith("mente")) return t.dropRight(5)
    if (n > 3 && t.last == 's') return t.dropRight(1)
    t
  }

  private def normFeminine(w: String): String = {
    val n = w.length
    if (n > 7 && (w.endsWith("inha") || w.endsWith("iaca") ||
        w.endsWith("eira"))) return w.dropRight(1) + "o"
    if (n > 6) {
      if (w.endsWith("osa") || w.endsWith("ica") || w.endsWith("ida") ||
          w.endsWith("ada") || w.endsWith("iva") || w.endsWith("ama"))
        return w.dropRight(1) + "o"
      if (w.endsWith("ona")) return w.dropRight(3) + "ão"
      if (w.endsWith("ora")) return w.dropRight(1)
      if (w.endsWith("esa")) return w.dropRight(3) + "ês"
      if (w.endsWith("na")) return w.dropRight(1) + "o"
    }
    w
  }
}

/** Russian token→term — stop-gap + light stem as one static call, the
  * [[graft.qp.TextAnalyzer.Russian]] executor side. Combined like
  * [[EsTerm]]: the recipe is length-gated suffix surgery over
  * Cyrillic declension endings, clearer as direct code than as a
  * regex fold. */
case class RuTermExpr(child: Expression) extends TokenFnExpr {
  override def prettyName: String = "ru_term"
  protected def staticCall: String = "graft.functions.RuTerm.termU"
  protected def run(s: UTF8String): UTF8String = RuTerm.termU(s)
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object RuTerm {
  private lazy val Stops = graft.qp.TextAnalyzer.RussianStopWords

  def termU(s: UTF8String): UTF8String = UTF8String.fromString(term(s.toString))

  /** The ONE Russian per-token chain — driver `queryTokens` and the
    * executor expression both run this. Stop check runs on the RAW
    * folded token (the set carries ё-forms — "её", "ещё"), before
    * stemming. */
  def term(tok: String): String = {
    if (Stops.contains(tok)) return graft.qp.TextAnalyzer.PositionGap
    stem(tok)
  }

  // the common noun/adjective case endings, grouped by length, each
  // group behind its own minimum-length gate (UniNE light-Russian
  // shape: remove ONE case ending, longest match first, then a final
  // -ь/-и/-нн cleanup). Ordered longest-first within each group.
  private val Suf4 = Array("иями", "оями")
  private val Suf3 = Array("иям", "иях", "оям", "оях", "ями", "ами",
    "его", "ему", "ими", "ого", "ому", "ыми", "оев")
  private val Suf2 = Array("ая", "яя", "ях", "юю", "ах", "ею", "их",
    "ия", "ию", "ой", "ом", "ов", "ое", "ою", "ую", "ям", "ых", "ея",
    "ам", "ем", "ей", "ём", "ев", "ий", "ый", "им", "ые", "ым", "ми")
  private val Drop1 = Set('а', 'е', 'и', 'о', 'у', 'й', 'ы', 'я', 'ь')

  /** Light Russian stemmer (the UniNE CLEF light-stemmer recipe family
    * — the approach behind Lucene's RussianLightStemFilter; an analog,
    * documented): ё folds to е first (orthographic variance), then ONE
    * case-ending removal fires — 4-char endings need len>6, 3-char
    * len>5, 2-char len>4, a final declension vowel/soft-sign len>3 —
    * then the cleanup: a trailing ь or и drops (infinitive/soft stems)
    * and a doubled нн loses one н. Tokens without Cyrillic endings
    * (ASCII loanwords, digits) pass through untouched. */
  def stem(t: String): String = {
    // ё→е is NORMALIZATION (Russians routinely type е for ё), not
    // suffix surgery — it must run before the length gate or short
    // tokens ("ёж") never meet their е-spelled twins
    val w = t.replace('ё', 'е')
    if (w.length < 4) return w
    normalize(removeCase(w))
  }

  private def removeCase(w: String): String = {
    val n = w.length
    if (n > 6) { val i = Suf4.indexWhere(w.endsWith); if (i >= 0) return w.dropRight(4) }
    if (n > 5) { val i = Suf3.indexWhere(w.endsWith); if (i >= 0) return w.dropRight(3) }
    if (n > 4) { val i = Suf2.indexWhere(w.endsWith); if (i >= 0) return w.dropRight(2) }
    if (n > 3 && Drop1.contains(w.last)) return w.dropRight(1)
    w
  }

  private def normalize(w: String): String = {
    val n = w.length
    if (n > 3) {
      if (w.last == 'ь' || w.last == 'и') return w.dropRight(1)
      if (w.last == 'н' && w(n - 2) == 'н') return w.dropRight(1)
    }
    w
  }
}

/** Dutch token→term — stop-gap + light stem as one static call, the
  * [[graft.qp.TextAnalyzer.Dutch]] executor side. Combined like
  * [[EsTerm]]: the doubling undo after the plural -en drop is
  * conditional character surgery a regex fold would obscure. */
case class NlTermExpr(child: Expression) extends TokenFnExpr {
  override def prettyName: String = "nl_term"
  protected def staticCall: String = "graft.functions.NlTerm.termU"
  protected def run(s: UTF8String): UTF8String = NlTerm.termU(s)
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object NlTerm {
  private lazy val Stops = graft.qp.TextAnalyzer.DutchStopWords

  def termU(s: UTF8String): UTF8String = UTF8String.fromString(term(s.toString))

  /** The ONE Dutch per-token chain — driver `queryTokens` and the
    * executor expression both run this. Accents FOLD BEFORE the stop
    * check (the Lucene dutch order): 'één' folds to 'een', which IS a
    * stop — checking the raw spelling first would index a term ('een')
    * no query can produce. Fold applies at every length; the <4-char
    * stemmer bypass only skips suffix surgery. */
  def term(tok: String): String = {
    val w = fold(tok)
    if (Stops.contains(w)) return graft.qp.TextAnalyzer.PositionGap
    stem(w)
  }

  private def isVowel(c: Char): Boolean = "aeiouy".indexOf(c.toInt) >= 0

  private def fold(t: String): String = t.map {
    case 'à' | 'á' | 'â' | 'ä' => 'a'
    case 'è' | 'é' | 'ê' | 'ë' => 'e'
    case 'ì' | 'í' | 'î' | 'ï' => 'i'
    case 'ò' | 'ó' | 'ô' | 'ö' => 'o'
    case 'ù' | 'ú' | 'û' | 'ü' => 'u'
    case c => c
  }

  /** Light Dutch stemmer (UniNE/CLEF light-recipe family — an analog,
    * documented): tokens shorter than 4 chars pass untouched; accented
    * vowels (tremas, French loan acutes) fold to base; then ONE suffix
    * family fires — -heden→-heid (len≥8), plural -en with the Dutch
    * consonant-doubling undo (bakken→bakk→bak; len≥5), plural -s
    * (len≥4, not after s), final mute -e after a consonant (len≥4). */
  def stem(t: String): String = {
    if (t.length < 4) return t
    val w = fold(t) // idempotent — keeps direct callers safe
    val n = w.length
    if (n >= 8 && w.endsWith("heden")) return w.dropRight(5) + "heid"
    if (n >= 5 && w.endsWith("en")) {
      var b = w.dropRight(2)
      if (b.length >= 3 && b.last == b(b.length - 2) && !isVowel(b.last))
        b = b.dropRight(1)
      return b
    }
    if (w.last == 's' && w(n - 2) != 's') return w.dropRight(1)
    if (w.last == 'e' && !isVowel(w(n - 2))) return w.dropRight(1)
    w
  }
}

/** Arabic token→term — stop-gap + light stem as one static call, the
  * [[graft.qp.TextAnalyzer.Arabic]] executor side. Input tokens are
  * already normalized (hamza-alef/maksura/teh-marbuta folds, marks
  * deleted) by the chain's fold. */
case class ArTermExpr(child: Expression) extends TokenFnExpr {
  override def prettyName: String = "ar_term"
  protected def staticCall: String = "graft.functions.ArTerm.termU"
  protected def run(s: UTF8String): UTF8String = ArTerm.termU(s)
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object ArTerm {
  private lazy val Stops = graft.qp.TextAnalyzer.ArabicStopWords

  def termU(s: UTF8String): UTF8String = UTF8String.fromString(term(s.toString))

  /** The ONE Arabic per-token chain — driver `queryTokens` and the
    * executor expression both run this. Stop check runs on the
    * NORMALIZED token (the set carries folded spellings), before
    * stemming. */
  def term(tok: String): String = {
    if (Stops.contains(tok)) return graft.qp.TextAnalyzer.PositionGap
    stem(tok)
  }

  // definite-article prefixes, longest first (the bare ال last so
  // وال/بال/كال/فال strip whole); the و conjunction strips separately
  private val Articles = Array("وال", "بال", "كال", "فال", "لل", "ال")
  // light-10 suffix list, longest-match-first; ة kept alongside ه for
  // tokens that bypass the fold (direct stem() callers)
  private val Suffixes = Array("ها", "ان", "ات", "ون", "ين", "يه",
    "ية", "ه", "ة", "ي")

  /** Light Arabic stemmer (the Larkey et al. light-10 family — an
    * analog, documented): strip the و conjunction when ≥3 chars
    * remain, then ONE definite-article prefix when ≥2 remain, then
    * ONE longest-match suffix when ≥2 remain. ASCII tokens pass
    * through untouched (no Arabic affix can match). */
  def stem(t: String): String = {
    var w = t
    if (w.length >= 4 && w.charAt(0) == 'و') w = w.substring(1)
    Articles.find(a => w.startsWith(a) && w.length - a.length >= 2)
      .foreach(a => w = w.substring(a.length))
    Suffixes.find(x => w.endsWith(x) && w.length - x.length >= 2)
      .foreach(x => w = w.dropRight(x.length))
    w
  }
}

/** Turkish token→term — apostrophe cut + stop-gap + light stem as one
  * static call, the [[graft.qp.TextAnalyzer.Turkish]] executor side.
  * Input tokens are already Turkish-case-folded (İ→i, I→ı — the
  * dotted/dotless pair the chain's translate tables encode; a plain
  * locale lowercase would map I→i and break every dotless-ı word). */
case class TrTermExpr(child: Expression) extends TokenFnExpr {
  override def prettyName: String = "tr_term"
  protected def staticCall: String = "graft.functions.TrTerm.termU"
  protected def run(s: UTF8String): UTF8String = TrTerm.termU(s)
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object TrTerm {
  private lazy val Stops = graft.qp.TextAnalyzer.TurkishStopWords

  def termU(s: UTF8String): UTF8String = UTF8String.fromString(term(s.toString))

  /** The ONE Turkish per-token chain — driver `queryTokens` and the
    * executor expression both run this. Order mirrors the Lucene
    * turkish chain: APOSTROPHE CUT first (the ApostropheFilter —
    * `istanbul'daki` keeps only `istanbul`; proper-noun suffixes
    * attach after an apostrophe in Turkish orthography), then the
    * stop check on the cut token, then the light stem. */
  def term(tok: String): String = {
    var t = tok
    val i1 = t.indexOf('\''); val i2 = t.indexOf('’')
    val ap = if (i1 < 0) i2 else if (i2 < 0) i1 else math.min(i1, i2)
    if (ap >= 0) t = t.substring(0, ap)
    if (t.isEmpty) return ""
    if (Stops.contains(t)) return graft.qp.TextAnalyzer.PositionGap
    stem(t)
  }

  // case/possessive endings, longest-match-first, all four vowel-
  // harmony variants per shape (ablative -dan/-den with the hard-
  // consonant t alternants, genitive -(n)ın, instrumental -(y)la,
  // locative -da, 3sg possessive -(s)ı, dative/accusative vowels)
  private val CaseSuffixes = Array(
    "ından", "inden", "undan", "ünden", "ların", "lerin",
    "ının", "inin", "unun", "ünün", "dan", "den", "tan", "ten",
    "nın", "nin", "nun", "nün", "yla", "yle", "la", "le",
    "da", "de", "ta", "te", "ın", "in", "un", "ün",
    "sı", "si", "su", "sü", "ı", "i", "u", "ü", "a", "e")

  /** Light Turkish stemmer (an ANALOG, documented — the noun-
    * inflection subset of the agglutinative chain, suffix-harmony
    * aware; not Snowball byte parity): strip ONE case/possessive
    * ending (longest match, min-stem gate scaled to suffix length so
    * a single-vowel strip never reduces below 4 chars), then the
    * plural -lar/-ler (roots of 2 like `ev` stay reachable), then one
    * REMAINING possessive left exposed by the plural strip
    * (kitap-ları = kitap+lar+ı arrives with the ı already removed by
    * stage 1; evleri = ev+ler+i needs the post-plural pass). ASCII
    * loanwords without Turkish endings pass untouched. */
  def stem(t: String): String = {
    var w = t
    CaseSuffixes.find(x => w.endsWith(x) &&
        w.length - x.length >= (if (x.length == 1) 4 else 3))
      .foreach(x => w = w.dropRight(x.length))
    if (w.length >= 5 && (w.endsWith("lar") || w.endsWith("ler")))
      w = w.dropRight(3)
    CaseSuffixes.find(x => w.endsWith(x) &&
        w.length - x.length >= (if (x.length == 1) 4 else 3))
      .foreach(x => w = w.dropRight(x.length))
    w
  }
}

/** Swedish token→term — stop-gap + light stem as one static call, the
  * [[graft.qp.TextAnalyzer.Swedish]] executor side. Input tokens are
  * already case-folded (A-Z + ÅÄÖ translate) by the chain's fold. */
case class SvTermExpr(child: Expression) extends TokenFnExpr {
  override def prettyName: String = "sv_term"
  protected def staticCall: String = "graft.functions.SvTerm.termU"
  protected def run(s: UTF8String): UTF8String = SvTerm.termU(s)
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object SvTerm {
  private lazy val Stops = graft.qp.TextAnalyzer.SwedishStopWords

  def termU(s: UTF8String): UTF8String = UTF8String.fromString(term(s.toString))

  /** The ONE Swedish per-token chain — driver `queryTokens` and the
    * executor expression both run this: stop check, then light stem. */
  def term(tok: String): String = {
    if (Stops.contains(tok)) return graft.qp.TextAnalyzer.PositionGap
    stem(tok)
  }

  /** Light Swedish stemmer (an ANALOG, documented — the noun
    * plural/definite subset of the Snowball swedish endings, not
    * byte parity): genitive -s first (len≥5, never after s — Swedish
    * genitive attaches OUTSIDE the definite ending: `widgetarnas`),
    * then the definite-plural -arna/-erna/-orna (stem≥3), then ONE
    * short plural/definite ending -ar/-er/-or/-en/-et/-na gated at
    * stem≥5 — the gate keeps short loanwords (`widget`, `gear`)
    * untouched while `widgetarna` still reduces past the definite
    * ending to the bare root on both sides of a search. */
  def stem(t: String): String = {
    var w = t
    if (w.length >= 5 && w.last == 's' && w(w.length - 2) != 's')
      w = w.dropRight(1)
    val defPl = Array("arna", "erna", "orna")
    defPl.find(x => w.endsWith(x) && w.length - x.length >= 3) match {
      case Some(x) => w = w.dropRight(x.length)
      case None =>
        val short = Array("ar", "er", "or", "en", "et", "na")
        short.find(x => w.endsWith(x) && w.length - x.length >= 5)
          .foreach(x => w = w.dropRight(x.length))
    }
    w
  }
}

/** Danish token→term — stop-gap + light stem as one static call, the
  * [[graft.qp.TextAnalyzer.Danish]] executor side. Input tokens are
  * already case-folded (A-Z + ÅÆØ translate) by the chain's fold. */
case class DaTermExpr(child: Expression) extends TokenFnExpr {
  override def prettyName: String = "da_term"
  protected def staticCall: String = "graft.functions.DaTerm.termU"
  protected def run(s: UTF8String): UTF8String = DaTerm.termU(s)
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object DaTerm {
  private lazy val Stops = graft.qp.TextAnalyzer.DanishStopWords

  def termU(s: UTF8String): UTF8String = UTF8String.fromString(term(s.toString))

  /** The ONE Danish per-token chain — driver `queryTokens` and the
    * executor expression both run this: stop check, then light stem. */
  def term(tok: String): String = {
    if (Stops.contains(tok)) return graft.qp.TextAnalyzer.PositionGap
    stem(tok)
  }

  private def isVowel(c: Char): Boolean = "aeiouyæøå".indexOf(c.toInt) >= 0

  /** Light Danish stemmer (an ANALOG, documented — the noun
    * plural/definite subset of the Snowball danish endings plus its
    * UNDOUBLE step, not byte parity): genitive -s first (len≥5,
    * never after s), then the definite-plural -erne/-ene (stem≥3),
    * then ONE short ending -er/-en/-et (stem≥5, the loanword gate —
    * `widget` stays) or mute -e (stem≥5), and finally the Danish
    * consonant-undouble the spelling demands once an ending is
    * stripped (`widgetterne` → `widgett` → `widget` — Danish doubles
    * the final consonant before a vowel-initial ending exactly like
    * Dutch, and Snowball danish undoubles after removal). */
  def stem(t: String): String = {
    var w = t
    if (w.length >= 5 && w.last == 's' && w(w.length - 2) != 's')
      w = w.dropRight(1)
    var stripped = false
    val defPl = Array("erne", "ene")
    defPl.find(x => w.endsWith(x) && w.length - x.length >= 3) match {
      case Some(x) => w = w.dropRight(x.length); stripped = true
      case None =>
        val short = Array("er", "en", "et", "e")
        short.find(x => w.endsWith(x) && w.length - x.length >= 5)
          .foreach { x => w = w.dropRight(x.length); stripped = true }
    }
    if (stripped && w.length >= 4 && w.last == w(w.length - 2) &&
        !isVowel(w.last))
      w = w.dropRight(1)
    w
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
