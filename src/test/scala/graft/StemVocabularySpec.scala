package graft

import graft.qp.TextAnalyzer
import org.scalatest.funsuite.AnyFunSuite

/** Generator-side pin of the VOCABULARY ASSUMPTION every
  * q_search_stemmed_* oracle rests on (SearchQueries oracle block):
  * the DuckDB side `list_contains`-matches the expected term EXACTLY
  * while the engine stems doc tokens through the language chain, so
  * parity requires that no fixture part-name token merely FOLDS into
  * a probe's analyzed term set without BEING the oracle's exact term
  * (a part named "widgets" or "ringen" would match engine-side but
  * not oracle-side). Until now that held by coincidence of the
  * driver's fixture vocabulary; this spec fails the build the moment
  * a regenerated fixture gains an analyzer-foldable form, turning
  * the coincidence into a checked invariant. */
class StemVocabularySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session

  /** (declared query, chain, probe phrase, oracle exact term) — must
    * mirror SearchQueries' stemmed entries; the mirror is itself
    * asserted against SparkEntry below so the table cannot drift. */
  private val probes: Seq[(String, TextAnalyzer, String, String)] = Seq(
    ("q_search_stemmed", TextAnalyzer.English, "the widgets", "widget"),
    ("q_search_stemmed_full", TextAnalyzer.EnglishFull, "widgetization",
      "widget"),
    ("q_search_stemmed_de", TextAnalyzer.German, "den Ringen", "ring"),
    ("q_search_stemmed_fr", TextAnalyzer.French, "les widgets", "widget"),
    ("q_search_stemmed_es", TextAnalyzer.Spanish, "los gizmos", "gizmo"),
    ("q_search_stemmed_it", TextAnalyzer.Italian, "gli widgeti", "widget"),
    ("q_search_stemmed_pt", TextAnalyzer.Portuguese, "os gizmos", "gizmo"),
    ("q_search_stemmed_nl", TextAnalyzer.Dutch, "de widgetten", "widget"),
    ("q_search_stemmed_sv", TextAnalyzer.Swedish, "de widgetarna",
      "widget"),
    ("q_search_stemmed_da", TextAnalyzer.Danish, "de widgetterne",
      "widget"))

  /** Every chain, probe or not: the fixture vocabulary must stay
    * inert under ALL of them (the four non-Latin stemmed queries
    * synthesize their own controlled corpora, but their chains still
    * run over `_all` searches of fixture content). */
  private val allChains: Seq[(String, TextAnalyzer)] = Seq(
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

  private def sfDirs: Seq[String] =
    Seq("sf0.001", "sf0.01", "sf0.1").map(s => s"/root/testdata/$s")
      .filter(d => new java.io.File(s"$d/part.parquet").exists())

  /** Distinct part-name tokens across every fixture scale, split the
    * way the ORACLES split (`[^a-z0-9]+` over lower) — the raw-name
    * shape test below guarantees every chain's own tokenizer agrees
    * on these names. */
  private lazy val vocab: Seq[String] = {
    val dirs = sfDirs
    assert(dirs.nonEmpty, "no fixture dirs under /root/testdata")
    dirs.flatMap { d =>
      spark.read.parquet(s"$d/part.parquet").select("p_name")
        .collect().map(_.getString(0))
    }.flatMap(n => n.toLowerCase.split("[^a-z0-9]+"))
      .filter(_.nonEmpty).distinct.sorted
  }

  /** Doc-side view of a single token: the drift-spec padding trick
    * keeps a stop word visible as its gap handling rather than a
    * silent trim. */
  private def fold(an: TextAnalyzer, tok: String): Seq[String] =
    an.queryTokens("zq " + tok + " zq").drop(1).dropRight(1)

  test("probe table mirrors the declared queries and their oracles") {
    probes.foreach { case (name, _, _, term) =>
      assert(SparkEntry.queries.contains(name), name)
      val sql = SparkEntry.oracleSql.getOrElse(name,
        fail(s"$name has no oracle"))
      assert(sql.contains(s"'$term'"),
        s"$name oracle no longer exact-matches '$term' — update this spec")
    }
  }

  test("fixture part names are plain ASCII words (every chain " +
      "tokenizes them identically to the oracle split)") {
    sfDirs.foreach { d =>
      val bad = spark.read.parquet(s"$d/part.parquet").select("p_name")
        .collect().map(_.getString(0))
        .filterNot(_.matches("[A-Za-z0-9 ]+"))
      assert(bad.isEmpty,
        s"$d part names outside [A-Za-z0-9 ]: ${bad.take(5).mkString(", ")}" +
          " — chain tokenizers and the oracle split may now disagree")
    }
  }

  test("no fixture token folds into a probe's term set without " +
      "equalling the oracle term") {
    probes.foreach { case (name, chain, phrase, term) =>
      val qTerms = chain.queryTokens(phrase).filter(_.nonEmpty).toSet
      assert(qTerms.nonEmpty, s"$name probe '$phrase' analyzed to nothing")
      // non-vacuity: the oracle's exact term must itself reach the
      // probe's term set through the chain
      assert(fold(chain, term).exists(qTerms), s"$name: oracle term " +
        s"'$term' does not fold into $qTerms — the query would be vacuous")
      val folded = vocab.filter(t => fold(chain, t).exists(qTerms))
      assert(folded == Seq(term),
        s"$name (${chain.getClass.getSimpleName}): fixture tokens $folded " +
          s"fold into the probe terms $qTerms but the oracle matches only " +
          s"'$term' — regenerated fixtures gained an analyzer-foldable " +
          "form; switch the oracle to stem-aware SQL or rename the part")
    }
  }

  test("the vocabulary is stem-inert under every chain (tokens map " +
      "to themselves or at most drop as stop gaps)") {
    // stronger than the per-probe assertion: ANY chain collapsing two
    // distinct fixture tokens onto one term would make some stemmed /
    // contains / _all oracle unfaithful the day a query probes it
    allChains.foreach { case (cname, chain) =>
      val byTerm = vocab.flatMap(t => fold(chain, t)
          .filter(_.nonEmpty).map(_ -> t))
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
      byTerm.foreach { case (term, srcs) =>
        assert(srcs.size == 1,
          s"$cname collapses fixture tokens ${srcs.mkString(",")} onto " +
            s"the single term '$term'")
      }
    }
  }
}
