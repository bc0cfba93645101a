package graft

import graft.qp.TextAnalyzer
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-style driver/executor drift pins for EVERY analyzer chain:
  * the Contains/_all match is only correct if the probe (analyzed on
  * the DRIVER via `queryTokens`) and the document (analyzed in the
  * SCAN via `tokensOf`) run the exact same chain. The per-chain
  * fixed-text drift tests in EngineSpec pin hand-picked hazards; this
  * spec hammers the same mirror with GENERATED text drawn from an
  * alphabet that concentrates on the chains' divergence hazards —
  * case folding outside ASCII (umlauts, tildes, cedillas), elision
  * apostrophes of both kinds, stop words, digits, CJK runs, and
  * length-gate boundary tokens. The classic drift failure is a fold
  * or regex handled slightly differently on the two sides (the
  * JVM-locale lower() trap); a generator finds the gap a curated list
  * misses.
  *
  * Also pins TOTALITY of the per-token term functions: no generated
  * token may throw (the stemmers do conditional character surgery
  * with index arithmetic — an off-by-one only surfaces on boundary
  * lengths). */
class AnalyzerDriftSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkSuite.session

  /** Words that stress each chain: stop words, inflections at the
    * length gates, accents, elisions, loanwords, digits. */
  private val wordGen: Gen[String] = Gen.frequency(
    6 -> Gen.oneOf(
      "the", "widgets", "running", "widgetization", "caresses",
      "den", "Ringen", "Glück", "straße", "häuser", "größe",
      "les", "l'avion", "d'énormes", "aujourd'hui", "chevaux", "été",
      "los", "gizmos", "canción", "señora", "más", "veces", "meses",
      "gli", "l'amico", "dell'arte", "città", "ragazzi", "perché",
      "os", "não", "corações", "papéis", "lençóis", "também", "bens",
      "и", "журналами", "журналов", "книгами", "ещё", "её", "Ёлка",
      "странный", "жизнь", "ночи", "abcжурналmix",
      "de", "widgetten", "bakken", "ideeën", "mogelijkheden", "auto's",
      "meisjes", "grootste", "één",
      "من", "المعلمون", "المعلمين", "والكتاب", "مكتبة", "إلى", "على",
      "مدرّسة", "abcكتابmix", "ـــ",
      "ve", "İstanbul'daki", "KITAPLARDAN", "kitapların", "evlerden",
      "İİII", "ılık", "değil", "Türkiye'nin", "çağrışım",
      "از", "كتاب‌هاي", "کتاب‌ها", "می‌روم", "آنها",
      "دفترهاي", "پژوهشگاه", "abcکتابmix",
      "och", "widgetarna", "flickorna", "widgetarnas", "husen", "ÅÄÖ",
      "og", "widgetterne", "husene", "bilerne", "widgetternes", "ÅÆØ",
      "中文分析", "机器学习", "カタカナ", "한국어", "abc中文mix"),
    3 -> Gen.choose(1, 9).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString)),
    2 -> Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf(
      "aeiouäöüßàâçéèêëîïôùûãõíóúñ'’0123456789".toList)).map(_.mkString)),
    1 -> Gen.oneOf("'", "’", "l'", "''", "123", "x1y2", "ß", "ÄÖÜ"))

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 8)
    ws <- Gen.listOfN(n, wordGen)
    sep <- Gen.oneOf(" ", "  ", ", ", ". ", "-", "; ")
  } yield ws.mkString(sep)

  // fixed seed: a failing text must reproduce on re-run (the
  // assertion message carries the text, but determinism keeps CI
  // meaningful). Bump the seed to re-roll the corpus deliberately.
  private lazy val texts: Seq[String] =
    Gen.listOfN(300, textGen)
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L))
      .get.distinct

  /** The padding trick from the fixed-text tests: tokensOf keeps
    * untrimmed position-gap sentinels, queryTokens trims them — pad
    * with a neutral token on both ends so nothing trims, then drop
    * the pads. Pads survive every chain verbatim ("zq" stems to
    * itself everywhere, is no stop word anywhere, and is ASCII). */
  private def driverView(an: TextAnalyzer, t: String): Seq[String] =
    an.queryTokens("zq " + t + " zq").drop(1).dropRight(1)

  private def chains: Seq[(String, TextAnalyzer)] = Seq(
    "standard" -> TextAnalyzer.Standard,
    "english" -> TextAnalyzer.English,
    "englishFull" -> TextAnalyzer.EnglishFull,
    "cjk" -> TextAnalyzer.Cjk,
    "german" -> TextAnalyzer.German,
    "french" -> TextAnalyzer.French,
    "spanish" -> TextAnalyzer.Spanish,
    "italian" -> TextAnalyzer.Italian,
    "portuguese" -> TextAnalyzer.Portuguese,
    "russian" -> TextAnalyzer.Russian,
    "dutch" -> TextAnalyzer.Dutch,
    "arabic" -> TextAnalyzer.Arabic,
    "turkish" -> TextAnalyzer.Turkish,
    "persian" -> TextAnalyzer.Persian,
    "swedish" -> TextAnalyzer.Swedish,
    "danish" -> TextAnalyzer.Danish)

  test("generated text: executor tokensOf == driver queryTokens for " +
      "every chain") {
    import spark.implicits._
    val df = texts.toDF("s")
    chains.foreach { case (name, an) =>
      val sparkToks = df.select(an.tokensOf(col("s")))
        .as[Seq[String]].collect().toSeq
      val driverToks = texts.map(t => driverView(an, t))
      sparkToks.zip(driverToks).zip(texts).foreach {
        case ((got, want), t) =>
          assert(got == want,
            s"[$name] drift on '$t': executor $got vs driver $want")
      }
    }
  }

  test("per-token term functions are total over generated tokens") {
    // every token the tokenizers can emit must stem/term without
    // throwing — index surgery at the length gates is the hazard
    val tokens = texts.flatMap(_.split("[\\s,.;-]+")).filter(_.nonEmpty) ++
      Seq("a", "ab", "abc", "abcd", "abcde", "abcdef", "ns", "es",
        "ões", "ães", "éis", "x'", "'x", "ll", "ss")
    tokens.foreach { t =>
      val lower = t.toLowerCase(java.util.Locale.ROOT)
      graft.functions.FrTerm.term(lower)
      graft.functions.EsTerm.term(lower)
      graft.functions.ItTerm.term(lower)
      graft.functions.PtTerm.term(lower)
      graft.functions.NlTerm.term(lower)
      graft.functions.ArTerm.term(lower)
      graft.functions.TrTerm.term(lower)
      graft.functions.SvTerm.term(lower)
      graft.functions.DaTerm.term(lower)
      graft.functions.StemLite.stemString(lower)
      graft.functions.StemFull.stemString(lower)
      graft.functions.StemDe.stemString(lower)
    }
  }
}
