package graft.qp

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable token analysis for the Contains (`:`) / `_all` filters —
  * the analog of the reference's per-field ES analyzer chain
  * (FTSService.scala:895-896 builds matchPhraseQuery over the analyzed
  * field; the chain is configured per index template,
  * indices_template_new.json:33-115). The default template uses the
  * standard analyzer (tokenize only), which [[TextAnalyzer.Standard]]
  * mirrors; deployments that configure the `english` chain get
  * stop-word removal + stemming, which [[TextAnalyzer.English]]
  * mirrors with a Porter-lite stemmer built from pure Spark
  * expressions (regexp_replace folds — codegen'd, no UDF).
  *
  * Both sides of a match run the SAME chain: the probe through
  * [[TextAnalyzer.queryTokens]] on the driver, the document tokens
  * through [[TextAnalyzer.docTokens]] in the scan. The stem rules are
  * ONE shared table folded by both, so driver and executor cannot
  * drift (the rules are ASCII-anchored — Standard/English tokens are
  * already lowercase ASCII alnum runs; the Cjk chain case-folds ASCII
  * ONLY, via a locale-free translate on both sides, precisely because
  * its input is non-ASCII).
  */
sealed trait TextAnalyzer {
  /** Tokenize + normalize the query-side probe (driver side). */
  def queryTokens(v: String): Seq[String]
  /** Normalize a document-side token-array Column (executor side,
    * input = lowercase alnum tokens, empties already dropped). */
  def docTokens(raw: Column): Column
  /** Full doc-side chain: string value → normalized token array.
    * Default = the shared alnum-run split piped through
    * [[docTokens]]; chains with their own segmentation (CJK)
    * override the whole thing. */
  def tokensOf(s: Column): Column =
    docTokens(filter(split(lower(s), "[^a-z0-9]+"), t => t =!= ""))
}

object TextAnalyzer {
  /** The shared lowercase alnum-run tokenizer (same contract as the
    * indexing side / TextAnalysis.tokens). */
  private[qp] def rawTokens(v: String): Seq[String] =
    v.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)

  /** ES standard-analyzer analog — tokenize only. The DEFAULT: this is
    * what the reference's shipped index template configures. */
  case object Standard extends TextAnalyzer {
    def queryTokens(v: String): Seq[String] = rawTokens(v)
    def docTokens(raw: Column): Column = raw
  }

  /** Position-gap sentinel: the ES stop filter removes the term but
    * PRESERVES position increments, so match_phrase "quick fox" must
    * not match a doc saying "quick the fox". Removed stop words become
    * this sentinel token instead of vanishing; phrase matching treats
    * a query-side gap as "any one term here" (ES positional slop-0
    * semantics — "quick the fox" matches "quick a fox"). */
  val PositionGap = "\u0001"

  /** ES english-analyzer analog, OPT-IN: Lucene's English stop set,
    * then a Porter-lite stem per token. Stop words are kept as
    * [[PositionGap]] sentinels doc-side (position fidelity); query
    * side trims leading/trailing gaps (they only shift positions) and
    * keeps interior ones. A stop-word-only probe analyzes to zero
    * terms and matches nothing (zero_terms_query = none), same as the
    * un-analyzed empty probe. */
  case object English extends TextAnalyzer {
    def queryTokens(v: String): Seq[String] = {
      val marked = rawTokens(v)
        .map(t => if (StopWords(t)) PositionGap else stem(t))
      marked.dropWhile(_ == PositionGap)
        .reverse.dropWhile(_ == PositionGap).reverse
    }
    def docTokens(raw: Column): Column =
      transform(raw, t =>
        when(t.isin(StopWords.toSeq: _*), lit(PositionGap))
          .otherwise(stemCol(t)))
  }

  /** [[English]] with FULL Porter derivational morphology (steps 2-4)
    * between the inflectional step-1 rules and the final-e drop —
    * OPT-IN: the reference's english chain ships Lucene's
    * PorterStemFilter (indices_template_new.json:33-115), which runs
    * all steps; the [[English]] default deliberately keeps the
    * retrieval-moving Porter-lite subset. Same gap-sentinel position
    * semantics. */
  case object EnglishFull extends TextAnalyzer {
    def queryTokens(v: String): Seq[String] = {
      val marked = rawTokens(v)
        .map(t => if (StopWords(t)) PositionGap else stemFull(t))
      marked.dropWhile(_ == PositionGap)
        .reverse.dropWhile(_ == PositionGap).reverse
    }
    def docTokens(raw: Column): Column =
      transform(raw, t =>
        when(t.isin(StopWords.toSeq: _*), lit(PositionGap))
          .otherwise(stemFullCol(t)))
  }

  /** ES cjk-analyzer analog, OPT-IN: ASCII alnum runs tokenize as
    * words (lowercased), CJK runs (Han ideographs + Hiragana/Katakana
    * + Hangul) emit OVERLAPPING BIGRAMS — "中文分" → 中文, 文分 — the
    * Lucene CJKBigramFilter recipe, which makes consecutive-bigram
    * phrase match ≈ substring match within a CJK run. A lone CJK char
    * (run of 1) is its own token. The Standard/English chains treat
    * CJK as delimiters (zero tokens — the pre-round-8 behavior,
    * pinned by test), so this chain is the one that can see CJK text
    * at all. */
  case object Cjk extends TextAnalyzer {
    private val CjkClass =
      "[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}]"
    private val RunPattern = s"[a-z0-9]+|$CjkClass+"
    // ASCII-ONLY case fold, identical on driver and executor by
    // construction: Spark's lower() delegates non-ASCII input to the
    // JVM-default-locale slow path (exactly the mixed-CJK case this
    // chain exists for), so a driver-side Locale.ROOT lowercase could
    // disagree with the scan — the same mirror divergence heavyHitters
    // had. Non-ASCII cased letters are left unfolded on BOTH sides.
    private val Upper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    private val Lower = "abcdefghijklmnopqrstuvwxyz"
    private def asciiFold(s: String): String =
      s.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
    def queryTokens(v: String): Seq[String] =
      RunPattern.r.findAllIn(asciiFold(v)).toSeq.flatMap(bigrams)
    private def bigrams(run: String): Seq[String] =
      if (!run.headOption.exists(_ > 'z')) Seq(run) // ASCII word token
      else if (run.codePointCount(0, run.length) <= 1) Seq(run)
      else { // overlapping code-point bigrams
        val cps = run.codePoints().toArray
        (0 until cps.length - 1).map(i =>
          new String(cps, i, 2))
      }
    /** Unused under the overridden [[tokensOf]] — identity. */
    def docTokens(raw: Column): Column = raw
    /** Doc side mirrors [[queryTokens]] with pure Spark expressions:
      * extract runs, explode CJK runs to bigrams via sequence+substr
      * (both code-point based on UTF8String), flatten. */
    override def tokensOf(s: Column): Column = {
      val runs = regexp_extract_all(translate(s, Upper, Lower),
        lit(RunPattern), lit(0))
      flatten(transform(runs, r => {
        val n = length(r)
        when(r.rlike("^[a-z0-9]"), array(r))        // ASCII word
          .when(n <= 1, array(r))                   // lone CJK char
          .otherwise(transform(sequence(lit(1), n - 1),
            i => r.substr(i, lit(2))))              // overlapping bigrams
      }))
    }
  }

  /** Light German analyzer, OPT-IN — the first per-language chain
    * beyond English (reference: per-language ES analyzers installed by
    * the index templates, indices_template_new.json:33-115). Differences
    * from the ASCII chains, each forced by German orthography:
    *   - tokenizes on German letter runs — umlauts/ß are LETTERS here,
    *     not delimiters (the shared `[^a-z0-9]+` split would cut
    *     "Glück" into "gl"+"ck");
    *   - case-folds ASCII + ÄÖÜ via a locale-free translate on BOTH
    *     sides (the Cjk discipline — never the JVM-locale lower());
    *   - stems with the published light-German rules (Savoy 2006, the
    *     recipe behind Lucene's GermanLightStemFilter): ß→ss and
    *     umlaut→base normalization, then two gated plural/case suffix
    *     steps — applied as the repo's standard sequential fold;
    *   - German stop set with the same [[PositionGap]] sentinel
    *     position semantics as [[English]].
    * Driver and executor share ONE precompiled fold
    * ([[graft.functions.StemDe.stemString]]) — no drift by
    * construction. */
  case object German extends TextAnalyzer {
    private[qp] val UpperDe = "ABCDEFGHIJKLMNOPQRSTUVWXYZÄÖÜ"
    private[qp] val LowerDe = "abcdefghijklmnopqrstuvwxyzäöü"
    private val RunDelims = "[^a-zäöüß0-9]+"
    private def fold(s: String): String = s.map { c =>
      val i = UpperDe.indexOf(c.toInt)
      if (i >= 0) LowerDe(i) else c
    }
    def queryTokens(v: String): Seq[String] = {
      val marked = fold(v).split(RunDelims).toSeq.filter(_.nonEmpty)
        .map(t => if (GermanStopWords(t)) PositionGap else stemDe(t))
      marked.dropWhile(_ == PositionGap)
        .reverse.dropWhile(_ == PositionGap).reverse
    }
    /** Unused under the overridden [[tokensOf]] — identity. */
    def docTokens(raw: Column): Column = raw
    override def tokensOf(s: Column): Column = {
      val runs = filter(split(translate(s, UpperDe, LowerDe), RunDelims),
        t => t =!= "")
      transform(runs, t =>
        when(t.isin(GermanStopWords.toSeq: _*), lit(PositionGap))
          .otherwise(stemDeCol(t)))
    }
  }

  /** Shared shape of the Latin-script per-language chains (French /
    * Spanish / Italian / Portuguese): a LOCALE-FREE case fold (the
    * same translate table on both sides — never the JVM-locale
    * lower(), the Cjk discipline), a letter-run tokenizer whose
    * delimiter class makes the language's letters (accents, ñ, ç,
    * apostrophes where elision exists) NOT delimiters, and ONE
    * combined token→term function running identically on the driver
    * (queryTokens) and the executor (a native expression) — stop
    * words come back as [[PositionGap]] sentinels with the usual
    * phrase semantics. `emptyTerms` marks chains whose term function
    * can normalize a token away entirely (elision leftovers) — those
    * drop before positions are assigned, on BOTH sides. German keeps
    * its two-stage (stop-set + regex-fold stem) form and does not
    * ride this base. */
  sealed abstract class LatinChain extends TextAnalyzer {
    protected def upperTable: String
    protected def lowerTable: String
    protected def runDelims: String
    protected def term(tok: String): String
    protected def termCol(c: Column): Column
    protected def emptyTerms: Boolean = false
    private def fold(s: String): String = s.map { c =>
      val i = upperTable.indexOf(c.toInt)
      if (i >= 0) lowerTable(i) else c
    }
    def queryTokens(v: String): Seq[String] = {
      val toks = fold(v).split(runDelims).toSeq.filter(_.nonEmpty).map(term)
      val marked = if (emptyTerms) toks.filter(_.nonEmpty) else toks
      marked.dropWhile(_ == PositionGap)
        .reverse.dropWhile(_ == PositionGap).reverse
    }
    /** Unused under the overridden [[tokensOf]] — identity. */
    def docTokens(raw: Column): Column = raw
    override def tokensOf(s: Column): Column = {
      val runs = filter(
        split(translate(s, upperTable, lowerTable), runDelims),
        t => t =!= "")
      val terms = transform(runs, t => termCol(t))
      if (emptyTerms) filter(terms, t => t =!= "") else terms
    }
  }

  /** Light French analyzer, OPT-IN — second per-language chain.
    * French adds a stage the ASCII chains lack: ELISION — "l'avion"
    * is ONE token whose article prefix must drop before stop/stem
    * checks (Lucene's ElisionFilter), so apostrophes are letters to
    * the tokenizer and the per-token pipeline is elision-strip →
    * apostrophe-drop → stop-check → minimal stem (Savoy's published
    * French minimal stemmer: the one Lucene's FrenchMinimalStemFilter
    * ships — len≥6 gate, aux→al, then trailing x/s/r/e/é and a final
    * doubled letter). The shared chain:
    * [[graft.functions.FrTerm.term]] / [[graft.functions.FrTermExpr]]. */
  case object French extends LatinChain {
    protected def upperTable = "ABCDEFGHIJKLMNOPQRSTUVWXYZÀÂÄÇÉÈÊËÎÏÔÖÙÛÜŸ"
    protected def lowerTable = "abcdefghijklmnopqrstuvwxyzàâäçéèêëîïôöùûüÿ"
    protected def runDelims = "[^a-zàâäçéèêëîïôöùûüÿœæ0-9'’]+"
    protected def term(tok: String): String = graft.functions.FrTerm.term(tok)
    protected def termCol(c: Column): Column = frTermCol(c)
    override protected def emptyTerms: Boolean = true
  }

  /** Light Spanish analyzer, OPT-IN — third per-language chain.
    * Same shape as [[German]] (no elision stage): tokenize on Spanish
    * letter runs (accented vowels and ñ are LETTERS), case-fold via a
    * locale-free translate on BOTH sides, then per token stop-check →
    * light stem. The stop check runs on the RAW folded token (the set
    * carries accented forms); the stemmer is Savoy 2006, the published
    * algorithm behind Lucene's SpanishLightStemFilter — len≥5 gate,
    * accent fold, one suffix rule (-o/-a/-e, -os/-as/-es, -ces→-z,
    * -eses→-es). Both sides run the ONE shared token→term function
    * ([[graft.functions.EsTerm.term]], native on the executor via
    * [[graft.functions.EsTermExpr]]) — drift-free by construction. */
  case object Spanish extends LatinChain {
    protected def upperTable = "ABCDEFGHIJKLMNOPQRSTUVWXYZÁÉÍÓÚÜÑ"
    protected def lowerTable = "abcdefghijklmnopqrstuvwxyzáéíóúüñ"
    protected def runDelims = "[^a-zàáâäèéêëìíîïòóôöùúûüñ0-9]+"
    protected def term(tok: String): String = graft.functions.EsTerm.term(tok)
    protected def termCol(c: Column): Column = esTermCol(c)
  }

  /** Light Italian analyzer, OPT-IN — fourth per-language chain.
    * Italian shares French's ELISION stage (l'amico, dell'arte are
    * one token whose article prefix drops before stop/stem checks —
    * Lucene's ElisionFilter with the Italian article set), so
    * apostrophes are letters to the tokenizer and BOTH sides run the
    * ONE shared token→term chain ([[graft.functions.ItTerm.term]],
    * native on the executor via [[graft.functions.ItTermExpr]]):
    * elision strip → apostrophe drop → stop check → light stem (Savoy
    * 2006, the recipe behind Lucene's ItalianLightStemFilter — len≥6
    * gate, accent fold, one final-vowel rule). Stop words come back
    * as [[PositionGap]] sentinels with the usual phrase semantics. */
  case object Italian extends LatinChain {
    protected def upperTable = "ABCDEFGHIJKLMNOPQRSTUVWXYZÀÈÉÌÍÎÒÓÙÚ"
    protected def lowerTable = "abcdefghijklmnopqrstuvwxyzàèéìíîòóùú"
    protected def runDelims = "[^a-zàèéìíîòóùú0-9'’]+"
    protected def term(tok: String): String = graft.functions.ItTerm.term(tok)
    protected def termCol(c: Column): Column = itTermCol(c)
    override protected def emptyTerms: Boolean = true
  }

  /** Light Portuguese analyzer, OPT-IN — fifth per-language chain.
    * Same shape as [[Spanish]] (no elision stage): tokenize on
    * Portuguese letter runs (accented vowels, ç and the nasal tildes
    * are LETTERS), case-fold via a locale-free translate on BOTH
    * sides, then per token stop-check → light stem. The stop check
    * runs on the RAW folded token (the set carries accented forms);
    * the stemmer is Savoy 2006, the published recipe behind Lucene's
    * PortugueseLightStemFilter — staged plural reduction (written
    * alternations like -ões→-ão, -ais→-al), feminine normalization,
    * theme-vowel drop, accent fold last. Both sides run the ONE
    * shared token→term function ([[graft.functions.PtTerm.term]],
    * native on the executor via [[graft.functions.PtTermExpr]]). */
  case object Portuguese extends LatinChain {
    protected def upperTable = "ABCDEFGHIJKLMNOPQRSTUVWXYZÁÂÃÀÇÉÊÍÓÔÕÚÜ"
    protected def lowerTable = "abcdefghijklmnopqrstuvwxyzáâãàçéêíóôõúü"
    protected def runDelims = "[^a-záâãàçéêíóôõúü0-9]+"
    protected def term(tok: String): String = graft.functions.PtTerm.term(tok)
    protected def termCol(c: Column): Column = ptTermCol(c)
  }

  /** Light Dutch analyzer, OPT-IN — sixth Latin chain. Same shape as
    * [[Spanish]]/[[Portuguese]] (no elision stage; Dutch clitic
    * apostrophes — 's ochtends, auto's — tokenize apart, the Lucene
    * dutch chain's standard-tokenizer behavior): tokenize on Dutch
    * letter runs (trema/acute vowels are LETTERS), case-fold via the
    * locale-free translate, then per token stop-check → light stem.
    * The stemmer is the UniNE/CLEF light-Dutch recipe family (an
    * analog, documented): -heden→-heid, plural -en with the Dutch
    * consonant-doubling undo (bakken→bak), plural -s, final mute -e —
    * one suffix family per token, length-gated. Shared chain:
    * [[graft.functions.NlTerm.term]] / [[graft.functions.NlTermExpr]]. */
  case object Dutch extends LatinChain {
    protected def upperTable = "ABCDEFGHIJKLMNOPQRSTUVWXYZÁÀÂÄÉÈÊËÍÌÎÏÓÒÔÖÚÙÛÜ"
    protected def lowerTable = "abcdefghijklmnopqrstuvwxyzáàâäéèêëíìîïóòôöúùûü"
    protected def runDelims = "[^a-záàâäéèêëíìîïóòôöúùûü0-9]+"
    protected def term(tok: String): String = graft.functions.NlTerm.term(tok)
    protected def termCol(c: Column): Column = nlTermCol(c)
  }

  /** Light Russian analyzer, OPT-IN — the first NON-LATIN alphabetic
    * chain (the [[LatinChain]] base is script-agnostic: tables, a
    * letter-run delimiter class, one shared token→term function).
    * Cyrillic uppercase folds through the same locale-free translate
    * discipline (the JVM-locale lower() trap is worse for Cyrillic —
    * it is ALL outside ASCII), the tokenizer keeps Latin letters too
    * (Russian text quotes Latin identifiers verbatim — the Lucene
    * russian chain's standard tokenizer does the same), and the
    * per-token chain is stop-check (Cyrillic function words, raw
    * folded token) → light stem: ё→е normalization, one case-ending
    * removal pass over the common noun/adjective declension suffixes
    * with length gates, then a final -ь/-и/-нн cleanup — the UniNE
    * CLEF light-Russian recipe family (the approach behind Lucene's
    * RussianLightStemFilter); an ANALOG, documented, not byte parity.
    * ASCII tokens pass through the stemmer untouched (no Cyrillic
    * suffix can match). Shared chain: [[graft.functions.RuTerm.term]]
    * / [[graft.functions.RuTermExpr]]. */
  case object Russian extends LatinChain {
    protected def upperTable =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZАБВГДЕЁЖЗИЙКЛМНОПРСТУФХЦЧШЩЪЫЬЭЮЯ"
    protected def lowerTable =
      "abcdefghijklmnopqrstuvwxyzабвгдеёжзийклмнопрстуфхцчшщъыьэюя"
    protected def runDelims = "[^a-z0-9а-яё]+"
    protected def term(tok: String): String = graft.functions.RuTerm.term(tok)
    protected def termCol(c: Column): Column = ruTermCol(c)
  }

  /** Light Arabic analyzer, OPT-IN — the first RTL chain (the Lucene
    * arabic recipe shape: normalize → tokenize → stop → light stem).
    * Arabic has no case, but its fold is RICHER than a 1:1 translate:
    * the orthographic marks (tatweel, the harakat/tanwin vowel signs,
    * shadda, sukun) must be DELETED, and the letter variants
    * normalized (hamza-carrying alefs أ/إ/آ/ٱ → bare ا, final alef
    * maksura ى → ي, teh marbuta ة → ه — Lucene's
    * ArabicNormalizationFilter). The executor runs the same fold as a
    * single `translate` (Spark deletes `from` chars with no `to`
    * counterpart); the driver fold is the same table, so the two
    * sides cannot diverge. Latin decoy runs fold a-z and tokenize too
    * (Arabic text quotes Latin identifiers verbatim). Per token:
    * stop-check (normalized function words) → light stem — the
    * Larkey et al. light-10 family: strip the و conjunction and ONE
    * definite-article prefix (ال وال بال كال فال لل), then ONE
    * longest-match suffix (ها ان ات ون ين يه ية ه ة ي), each behind
    * a minimum-stem gate. An ANALOG, documented, not byte parity. */
  case object Arabic extends TextAnalyzer {
    // deleted outright: tatweel + fathatan..sukun (U+064B-U+0652);
    // escapes, not literals — combining marks in source are invisible
    private[qp] val DropChars =
      "\u0640\u064B\u064C\u064D\u064E\u064F\u0650\u0651\u0652"
    private[qp] val FromChars =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ" + "أإآٱ" + "ى" + "ة"
    private[qp] val ToChars =
      "abcdefghijklmnopqrstuvwxyz" + "اااا" + "ي" + "ه"
    // letter runs: Latin, digits, and the Arabic letter block ء..ي
    // (the deleted marks never reach the tokenizer)
    private val RunDelims = "[^a-z0-9ء-ي]+"
    private def fold(s: String): String = {
      val b = new StringBuilder(s.length)
      s.foreach { c =>
        if (DropChars.indexOf(c.toInt) < 0) {
          val i = FromChars.indexOf(c.toInt)
          b.append(if (i >= 0) ToChars(i) else c)
        }
      }
      b.toString
    }
    def queryTokens(v: String): Seq[String] = {
      val toks = fold(v).split(RunDelims).toSeq.filter(_.nonEmpty)
        .map(graft.functions.ArTerm.term)
      toks.dropWhile(_ == PositionGap)
        .reverse.dropWhile(_ == PositionGap).reverse
    }
    /** Unused under the overridden [[tokensOf]] — identity. */
    def docTokens(raw: Column): Column = raw
    override def tokensOf(s: Column): Column = {
      val folded = translate(s, FromChars + DropChars, ToChars)
      transform(filter(split(folded, RunDelims), t => t =!= ""),
        t => arTermCol(t))
    }
  }

  /** Light Turkish analyzer, OPT-IN — the chain that exercises the
    * canonical locale-fold trap: Turkish has a dotted/dotless-i PAIR
    * (İ/i and I/ı), so the case fold must map İ→i but I→ı — a plain
    * `lower()` (or any A-Z translate) maps I→i and corrupts every
    * dotless-ı word, which is exactly why the JVM-default-locale
    * lowercase is famous for breaking Turkish text. The
    * [[LatinChain]] translate tables encode the pair explicitly and
    * run locale-free on BOTH sides. Tokenizer keeps apostrophes (both
    * kinds) as letters; the per-token chain mirrors Lucene's turkish
    * analyzer order: APOSTROPHE CUT (drop the apostrophe and
    * everything after it — proper-noun inflection attaches after an
    * apostrophe in Turkish orthography: `İstanbul'daki` → `istanbul`)
    * → stop check → light stem (an agglutinative-subset ANALOG,
    * documented at [[graft.functions.TrTerm.stem]]: one vowel-harmony
    * case/possessive ending, the plural -lar/-ler, one post-plural
    * possessive). Shared chain: [[graft.functions.TrTerm.term]] /
    * [[graft.functions.TrTermExpr]]. */
  case object Turkish extends LatinChain {
    // İ (U+0130) → i and I → ı (U+0131): the pair that breaks naive
    // A-Z tables — note ASCII I is deliberately ABSENT from the A-Z
    // run below and appended with its dotless lowercase
    protected def upperTable =
      "ABCDEFGHJKLMNOPQRSTUVWXYZ" + "I" + "İ" + "ÇĞÖŞÜ"
    protected def lowerTable =
      "abcdefghjklmnopqrstuvwxyz" + "ı" + "i" + "çğöşü"
    protected def runDelims = "[^a-zçğıöşü0-9'’]+"
    protected def term(tok: String): String = graft.functions.TrTerm.term(tok)
    protected def termCol(c: Column): Column = trTermCol(c)
    override protected def emptyTerms: Boolean = true
  }

  /** Light Swedish analyzer, OPT-IN — first Scandinavian chain.
    * Same shape as [[Dutch]] (no elision, no apostrophe stage):
    * locale-free fold over A-Z + ÅÄÖ, letter runs keep åäö, one
    * combined stop+stem term function shared by driver and executor
    * ([[graft.functions.SvTerm.term]] /
    * [[graft.functions.SvTermExpr]]). The stemmer is the noun
    * plural/definite subset of the Snowball swedish endings (an
    * analog, documented at [[graft.functions.SvTerm.stem]]): the
    * definite-plural -arna/-erna/-orna, a gated short ending
    * (-ar/-er/-or/-en/-et/-na), outer genitive -s. */
  case object Swedish extends LatinChain {
    protected def upperTable = "ABCDEFGHIJKLMNOPQRSTUVWXYZÅÄÖ"
    protected def lowerTable = "abcdefghijklmnopqrstuvwxyzåäö"
    protected def runDelims = "[^a-zåäö0-9]+"
    protected def term(tok: String): String = graft.functions.SvTerm.term(tok)
    protected def termCol(c: Column): Column = svTermCol(c)
  }

  /** Light Danish analyzer, OPT-IN — second Scandinavian chain.
    * Distinguished from [[Swedish]] by the å/æ/ø letter set and the
    * UNDOUBLE step Danish spelling demands (Snowball danish's
    * undouble: the final consonant doubles before a vowel-initial
    * ending, so stripping -erne from `widgetterne` must also undo the
    * tt — the same doubling undo the [[Dutch]] -en rule carries).
    * Shared chain: [[graft.functions.DaTerm.term]] /
    * [[graft.functions.DaTermExpr]]. */
  case object Danish extends LatinChain {
    protected def upperTable = "ABCDEFGHIJKLMNOPQRSTUVWXYZÅÆØ"
    protected def lowerTable = "abcdefghijklmnopqrstuvwxyzåæø"
    protected def runDelims = "[^a-zåæø0-9]+"
    protected def term(tok: String): String = graft.functions.DaTerm.term(tok)
    protected def termCol(c: Column): Column = daTermCol(c)
  }

  /** Persian analyzer, OPT-IN — the second RTL chain. Reuses the
    * Arabic recipe shape (delete-capable fold → tokenize → stop) with
    * the Persian-specific pieces: the fold ADDS the Persian letter
    * normalizations (Arabic kaf ك → keheh ک, Arabic yeh ي AND alef
    * maksura ى → Farsi yeh ی — Lucene's PersianNormalizationFilter on
    * top of the ArabicNormalizationFilter folds) while keeping the
    * Arabic deletions (tatweel + harakat/tanwin/shadda/sukun) and the
    * hamza-alef / teh-marbuta folds; the ZERO-WIDTH NON-JOINER
    * (U+200C), which Persian orthography uses INSIDE compound words
    * (کتاب‌ها), is simply not a letter to the tokenizer, so it splits
    * compounds exactly like Lucene's PersianCharFilter mapping it to
    * a space; and there is NO stemmer — Lucene's PersianAnalyzer
    * ships none (light morphology comes from the ZWNJ split + the
    * stop set carrying the frequent clitics ها/های/می), and this
    * chain matches that. Stop marking is set membership on both
    * sides (the [[English]] precedent — no custom expression
    * needed). */
  case object Persian extends TextAnalyzer {
    private[qp] val DropChars = Arabic.DropChars
    private[qp] val FromChars =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ" + "أإآٱ" + "ىي" + "ك" + "ة"
    private[qp] val ToChars =
      "abcdefghijklmnopqrstuvwxyz" + "اااا" + "یی" + "ک" + "ه"
    // letter runs: Latin, digits, the Arabic block, and the Persian
    // letters (پ چ ژ گ ک ی) the fold emits; ZWNJ is NOT a letter —
    // it delimits, splitting compounds
    private val RunDelims = "[^a-z0-9ء-يپچژگکی]+"
    private def fold(s: String): String = {
      val b = new StringBuilder(s.length)
      s.foreach { c =>
        if (DropChars.indexOf(c.toInt) < 0) {
          val i = FromChars.indexOf(c.toInt)
          b.append(if (i >= 0) ToChars(i) else c)
        }
      }
      b.toString
    }
    def queryTokens(v: String): Seq[String] = {
      val toks = fold(v).split(RunDelims).toSeq.filter(_.nonEmpty)
        .map(t => if (PersianStopWords(t)) PositionGap else t)
      toks.dropWhile(_ == PositionGap)
        .reverse.dropWhile(_ == PositionGap).reverse
    }
    /** Unused under the overridden [[tokensOf]] — identity. */
    def docTokens(raw: Column): Column = raw
    override def tokensOf(s: Column): Column = {
      val folded = translate(s, FromChars + DropChars, ToChars)
      transform(filter(split(folded, RunDelims), t => t =!= ""),
        t => when(t.isin(PersianStopWords.toSeq: _*), lit(PositionGap))
          .otherwise(t))
    }
  }

  /** Common Turkish function-word stop set (conjunctions, particles,
    * pronouns, question clitics — the stable core of the public
    * Lucene turkish list), in folded spellings. */
  val TurkishStopWords: Set[String] = Set(
    "acaba", "ama", "ancak", "artık", "asla", "az", "bazı", "belki",
    "ben", "beni", "benim", "bir", "biri", "birkaç", "biz", "bize",
    "bizim", "bu", "buna", "bunu", "bunun", "burada", "böyle", "çok",
    "çünkü", "da", "daha", "de", "değil", "diye", "eğer", "en",
    "gibi", "hem", "hep", "hepsi", "her", "hiç", "için", "ile",
    "ise", "kadar", "ki", "kim", "mi", "mı", "mu", "mü", "nasıl",
    "ne", "neden", "nerede", "niye", "o", "ona", "onlar", "onun",
    "sen", "siz", "sonra", "şey", "şu", "tüm", "ve", "veya", "ya",
    "yani", "çoğu")

  /** Executor-side Turkish token→term — one static call per token
    * into the same shared chain ([[graft.functions.TrTermExpr]]). */
  def trTermCol(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.TrTermExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(c)))

  /** Common Swedish function-word stop set (articles, pronouns,
    * prepositions, conjunctions — the stable core of the public
    * Lucene/Snowball swedish list). */
  val SwedishStopWords: Set[String] = Set(
    "och", "det", "att", "i", "en", "jag", "hon", "som", "han", "på",
    "den", "med", "var", "sig", "för", "så", "till", "är", "men",
    "ett", "om", "hade", "de", "av", "icke", "mig", "du", "henne",
    "då", "sin", "nu", "har", "inte", "hans", "honom", "skulle",
    "hennes", "där", "min", "man", "ej", "vid", "kunde", "något",
    "från", "ut", "när", "efter", "upp", "vi", "dem", "vad", "över",
    "än", "dig", "kan", "sina", "här", "ha", "mot", "alla", "under",
    "någon", "eller", "allt", "mycket", "sedan", "ju", "denna",
    "själv", "detta", "åt", "utan", "varit", "hur", "ingen", "mitt",
    "ni", "bli", "blev", "oss", "din", "dessa", "några", "deras",
    "blir", "mina", "samma", "vilken", "er", "sådan", "vår", "blivit",
    "dess", "inom", "mellan", "sådant", "varför", "varje", "vilka",
    "ditt", "vem", "vilket", "sådana", "vart", "dina", "vars", "vårt",
    "våra", "ert", "era", "vilkas")

  /** Executor-side Swedish token→term — one static call per token
    * into the same shared chain ([[graft.functions.SvTermExpr]]). */
  def svTermCol(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.SvTermExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(c)))

  /** Common Danish function-word stop set (articles, pronouns,
    * prepositions, conjunctions — the stable core of the public
    * Lucene/Snowball danish list). */
  val DanishStopWords: Set[String] = Set(
    "og", "i", "jeg", "det", "at", "en", "den", "til", "er", "som",
    "på", "de", "med", "han", "af", "for", "ikke", "der", "var",
    "mig", "sig", "men", "et", "har", "om", "vi", "min", "havde",
    "ham", "hun", "nu", "over", "da", "fra", "du", "ud", "sin",
    "dem", "os", "op", "man", "hans", "hvor", "eller", "hvad",
    "skal", "selv", "her", "alle", "vil", "blev", "kunne", "ind",
    "når", "være", "dog", "noget", "ville", "jo", "deres", "efter",
    "ned", "skulle", "denne", "end", "dette", "mit", "også", "under",
    "have", "dig", "anden", "hende", "mine", "alt", "meget", "sit",
    "sine", "vor", "mod", "disse", "hvis", "din", "nogle", "hos",
    "blive", "mange", "ad", "bliver", "hendes", "været", "thi",
    "jer", "sådan")

  /** Executor-side Danish token→term — one static call per token
    * into the same shared chain ([[graft.functions.DaTermExpr]]). */
  def daTermCol(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.DaTermExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(c)))

  /** Common Persian function-word stop set, in NORMALIZED spellings
    * (the stop check runs after the fold: آن → ان, می‌... clitic
    * tokens appear post-ZWNJ-split). Carries the plural/clitic
    * particles (ها های می) that do Persian's light-morphology work in
    * the absence of a stemmer. The stable core of the public Lucene
    * persian list. */
  val PersianStopWords: Set[String] = Set(
    "از", "در", "به", "که", "را", "با", "این", "ان", "است", "بود",
    "شد", "می", "ها", "های", "هایی", "برای", "تا", "هم", "او", "ما",
    "شما", "انها", "من", "تو", "خود", "اگر", "نیز", "یا", "هر",
    "چه", "بر", "پس", "یک", "ای", "اما", "کرد", "شده", "باید",
    "شود", "دارد", "بی", "چون", "نه", "اند", "بودن", "کردن", "وی",
    "انچه", "همه", "هیچ", "دیگر", "چند", "روی", "میان", "البته")

  /** Common Russian function-word stop set (conjunctions, particles,
    * pronouns, frequent prepositions — the stable core of the public
    * Snowball russian list). Checked on the raw folded token. */
  val RussianStopWords: Set[String] = Set(
    "а", "без", "бы", "был", "была", "были", "было", "быть", "в",
    "вам", "вас", "весь", "во", "вот", "все", "всё", "вы", "где",
    "да", "даже", "для", "до", "его", "ее", "её", "ей", "ему",
    "если", "есть", "еще", "ещё", "же", "за", "и", "из", "или",
    "им", "их", "к", "как", "кто", "ли", "меня", "мне", "мы", "на",
    "не", "него", "ней", "нет", "ни", "но", "ну", "о", "об", "он",
    "она", "они", "от", "по", "под", "при", "с", "со", "так",
    "такой", "там", "тебя", "то", "тогда", "тоже", "только", "тот",
    "ты", "у", "уже", "что", "чтобы", "это", "этот", "я")

  /** Executor-side Russian token→term — one static call per token
    * into the same shared chain ([[graft.functions.RuTermExpr]]). */
  def ruTermCol(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.RuTermExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(c)))

  /** Common Dutch function-word stop set (articles, pronouns,
    * frequent prepositions/conjunctions — the stable core of the
    * public Snowball dutch list). */
  val DutchStopWords: Set[String] = Set(
    "aan", "al", "alles", "als", "altijd", "andere", "ben", "bij",
    "daar", "dan", "dat", "de", "der", "deze", "die", "dit", "doch",
    "doen", "door", "dus", "een", "eens", "en", "er", "ge", "geen",
    "geweest", "haar", "had", "heb", "hebben", "heeft", "hem", "het",
    "hier", "hij", "hoe", "hun", "iemand", "iets", "ik", "in", "is",
    "ja", "je", "kan", "kon", "kunnen", "maar", "me", "meer", "men",
    "met", "mij", "mijn", "moet", "na", "naar", "niet", "niets",
    "nog", "nu", "of", "om", "omdat", "ons", "ook", "op", "over",
    "reeds", "te", "tegen", "toch", "toen", "tot", "u", "uit", "uw",
    "van", "veel", "voor", "want", "waren", "was", "wat", "we",
    "wel", "werd", "wezen", "wie", "wil", "worden", "wordt", "zal",
    "ze", "zelf", "zich", "zij", "zijn", "zo", "zonder", "zou")

  /** Executor-side Dutch token→term — one static call per token into
    * the same shared chain ([[graft.functions.NlTermExpr]]). */
  def nlTermCol(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.NlTermExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(c)))

  /** Common Arabic function-word stop set, in NORMALIZED spellings —
    * the stop check runs AFTER the fold, so hamza-alef forms are
    * stored bare-alef and alef-maksura forms with ي (إلى → الي,
    * على → علي, حتى → حتي). The stable core of the public Lucene
    * arabic list. */
  val ArabicStopWords: Set[String] = Set(
    "من", "في", "علي", "الي", "عن", "ان", "لا", "ما", "مع", "هذا",
    "هذه", "ذلك", "تلك", "التي", "الذي", "هو", "هي", "هم", "او",
    "كان", "كانت", "يكون", "قد", "لم", "لن", "كل", "بعد", "قبل",
    "عند", "حتي", "اذا", "ثم", "بين", "لكن", "منذ", "فيه", "فيها",
    "عليه", "عليها", "اليه", "انه", "انها", "كما", "لدي", "غير",
    "حول", "دون", "بها", "به", "له", "لها", "الا", "اي", "اما",
    "ايضا", "كيف", "متي", "اين", "هل", "نحن", "انا", "انت")

  /** Executor-side Arabic token→term — one static call per token into
    * the same shared chain ([[graft.functions.ArTermExpr]]). */
  def arTermCol(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.ArTermExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(c)))

  /** Common Italian function-word stop set (articles incl. the elided
    * forms' cores, pronouns, frequent prepositions — the stable core
    * of the public Snowball italian list, accented forms included).
    * Checked on the elision-stripped token. */
  val ItalianStopWords: Set[String] = Set(
    "a", "ad", "agli", "al", "alla", "alle", "anche", "che", "chi",
    "ci", "come", "con", "da", "dal", "dalla", "degli", "dei", "del",
    "della", "delle", "di", "e", "ed", "è", "era", "gli", "ha",
    "hanno", "ho", "i", "il", "in", "la", "le", "lei", "lo", "loro",
    "lui", "ma", "mi", "ne", "nei", "nel", "nella", "non", "o", "per",
    "più", "quella", "quello", "questa", "questo", "se", "si", "sono",
    "su", "sua", "sue", "sui", "suo", "tra", "tu", "un", "una", "uno")

  /** Elidable article/particle prefixes (Lucene ElisionFilter's
    * Italian default set): stripped with their apostrophe before any
    * other per-token stage. */
  val ItalianElisions: Set[String] = Set(
    "c", "l", "all", "dall", "dell", "nell", "sull", "coll", "pell",
    "gl", "agl", "dagl", "degl", "negl", "sugl", "un", "m", "t", "s",
    "v", "d")

  /** Executor-side Italian token→term — one static call per token
    * into the same shared chain ([[graft.functions.ItTermExpr]]). */
  def itTermCol(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.ItTermExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(c)))

  /** Common Portuguese function-word stop set (articles, pronouns,
    * frequent prepositions/conjunctions — the stable core of the
    * public Snowball portuguese list, accented forms included). */
  val PortugueseStopWords: Set[String] = Set(
    "a", "à", "ao", "aos", "as", "às", "com", "como", "da", "das",
    "de", "do", "dos", "e", "é", "ela", "ele", "eles", "em", "entre",
    "era", "essa", "esse", "esta", "este", "eu", "foi", "há", "isso",
    "isto", "já", "mais", "mas", "me", "mesmo", "muito", "na", "não",
    "nas", "nem", "no", "nos", "o", "os", "ou", "para", "pela",
    "pelo", "por", "quando", "que", "quem", "se", "sem", "ser", "seu",
    "sua", "também", "tem", "um", "uma", "você")

  /** Executor-side Portuguese token→term — one static call per token
    * into the same shared chain ([[graft.functions.PtTermExpr]]). */
  def ptTermCol(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.PtTermExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(c)))

  /** Common Spanish function-word stop set (articles, pronouns,
    * frequent prepositions/conjunctions — the stable core of the
    * public Snowball spanish list, accented forms included). */
  val SpanishStopWords: Set[String] = Set(
    "a", "al", "como", "con", "cual", "cuando", "de", "del", "donde",
    "el", "él", "ella", "ellos", "en", "entre", "esa", "ese", "esta",
    "este", "esto", "hasta", "hay", "la", "las", "le", "les", "lo",
    "los", "más", "me", "muy", "ni", "no", "nos", "o", "otra", "otro",
    "para", "pero", "por", "porque", "que", "qué", "se", "sin",
    "sobre", "su", "sus", "también", "un", "una", "uno", "y", "ya")

  /** Executor-side Spanish token→term — one static call per token
    * into the same shared chain ([[graft.functions.EsTermExpr]]). */
  def esTermCol(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.EsTermExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(c)))

  /** Common French function-word stop set (articles incl. elided
    * forms' cores, pronouns, frequent prepositions — the stable core
    * of the public Snowball french list). Checked on the
    * elision-stripped token. */
  val FrenchStopWords: Set[String] = Set(
    "au", "aux", "avec", "ce", "ces", "cette", "dans", "de", "des",
    "du", "elle", "en", "est", "et", "il", "ils", "je", "la", "le",
    "les", "leur", "lui", "ma", "mais", "ne", "nous", "on", "ou",
    "par", "pas", "plus", "pour", "qui", "que", "sa", "se", "ses",
    "son", "sont", "sur", "tu", "un", "une", "vous")

  /** Elidable article/particle prefixes (Lucene ElisionFilter's French
    * default set): stripped with their apostrophe before any other
    * per-token stage. */
  val FrenchElisions: Set[String] = Set(
    "l", "m", "t", "qu", "n", "s", "j", "d", "c", "jusqu", "quoiqu",
    "lorsqu", "puisqu")

  /** Executor-side French token→term — one static call per token into
    * the same shared chain ([[graft.functions.FrTermExpr]]). */
  def frTermCol(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.FrTermExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(c)))

  /** Common German function-word stop set (articles, pronouns,
    * frequent conjunctions/prepositions — the stable core of the
    * public Snowball german list). Checked BEFORE stemming, like
    * [[StopWords]]. */
  val GermanStopWords: Set[String] = Set(
    "aber", "als", "am", "an", "auch", "auf", "aus", "bei", "bin",
    "bis", "das", "dem", "den", "der", "des", "die", "du", "ein",
    "eine", "einem", "einen", "einer", "eines", "er", "es", "für",
    "hat", "ich", "im", "in", "ist", "mit", "nicht", "oder", "sie",
    "sind", "und", "von", "war", "wir", "zu", "zum", "zur")

  /** Light-German stem rules (Savoy 2006), as the repo's standard
    * ordered (pattern → replacement) fold: ß/umlaut normalization
    * first (tokens are pure [a-z0-9] afterwards), then the two suffix
    * steps with their original length gates encoded as minimum-stem
    * quantifiers (-ern needs len>5 ⇒ stem ≥3, -em/-en/-er/-es len>4,
    * -e len>3, -s len>3 after a valid s-ending; step 2: -est len>5,
    * -er/-en len>4, -st len>4 after a valid st-ending). The
    * sequential fold mirrors the canonical two-step cascade
    * (step 1 -ern then step 2 -er both fire, as in the original). */
  val GermanStemRules: Seq[(String, String)] = Seq(
    "ß" -> "ss", "ä" -> "a", "ö" -> "o", "ü" -> "u",
    "^([a-z0-9]{3,})ern$" -> "$1",
    "^([a-z0-9]{3,})e[mnrs]$" -> "$1",
    "^([a-z0-9]{3,})e$" -> "$1",
    "^([a-z0-9]{2,}[bdfghklmnrt])s$" -> "$1",
    "^([a-z0-9]{3,})est$" -> "$1",
    "^([a-z0-9]{3,})e[rn]$" -> "$1",
    "^([a-z0-9]{2,}[bdfghklmnt])st$" -> "$1")

  /** Driver-side German stem — same one-fold discipline as [[stem]]. */
  def stemDe(t: String): String = graft.functions.StemDe.stemString(t)

  /** Executor-side German stem — one static call per token into the
    * same precompiled fold ([[graft.functions.StemDeExpr]]). */
  def stemDeCol(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.StemDeExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(c)))

  /** Lucene EnglishAnalyzer's default stop set (33 words, public and
    * stable across Lucene versions). */
  val StopWords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  /** Porter-lite stem rules: ordered (pattern → replacement) pairs,
    * each applied once, top to bottom. Covers Porter steps 1a (plural),
    * 1b (-eed/-ed/-ing with the doubled-consonant, at/bl/iz and
    * short-CVC restorations), 1c (y→i) and 5a (final-e drop) — the
    * inflectional morphology that moves retrieval; the derivational
    * steps 2-4 (-ization, -fulness, …) are deliberately out of scope.
    * Anchored patterns over lowercase alnum tokens; at most one rule
    * family fires per suffix, so the fold is branch-cheap. */
  val StemRules: Seq[(String, String)] = Seq(
    "sses$" -> "ss",                                   // caresses → caress
    "ies$" -> "i",                                     // ponies → poni
    "^([a-z0-9]+[^s])s$" -> "$1",                      // widgets → widget (keeps -ss)
    "^([a-z0-9]{2,})eed$" -> "$1ee",                   // agreed → agree (feed stays)
    "^([a-z0-9]*[aeiou][a-z0-9]*?(?:at|bl|iz))(?:ed|ing)$" -> "$1e", // conflated → conflate
    "^([a-z0-9]*[aeiou][a-z0-9]*?([bcdfghjkmnpqrtvwx]))\\2(?:ed|ing)$" -> "$1", // hopped → hop
    "^([^aeiou]*[aeiou][^aeiouwxy])(?:ed|ing)$" -> "$1e", // wired/wiring → wire (short CVC)
    "^([a-z0-9]*[aeiou][a-z0-9]*[^e])ed$" -> "$1",     // wanted → want (eed excluded above)
    "^([a-z0-9]*[aeiou][a-z0-9]*)ing$" -> "$1",        // singing → sing (sing stays)
    "^([a-z0-9]*[aeiou][a-z0-9]*)y$" -> "$1i",         // pony → poni (sky stays)
    "^([a-z0-9]*[aeiou][a-z0-9]{2,})e$" -> "$1")       // package → packag (late stays)

  /** Driver-side stem — delegates to the ONE precompiled Porter-lite
    * fold ([[graft.functions.StemLite.stemString]]) the executor
    * expression also runs: no drift by construction. */
  def stem(t: String): String = graft.functions.StemLite.stemString(t)

  /** Executor-side stem — a native expression making ONE static call
    * per token into the same precompiled fold (was 11 chained
    * regexp_replace nodes; see [[graft.functions.StemLiteExpr]]). */
  def stemCol(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.StemLiteExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(c)))

  // ------------------------- full Porter (steps 2-4), EnglishFull only

  // measure gates as regex fragments: m>0 ≈ one vowel-consonant pair in
  // the captured stem, m>1 ≈ two (vowel RUNS collapse naturally — the
  // pair matches the run's last vowel). Digits count as consonants,
  // same domain discipline as the step-1 table.
  private val M1 = "[a-z0-9]*[aeiou][^aeiou][a-z0-9]*"
  private val M2 = "[a-z0-9]*[aeiou][^aeiou][a-z0-9]*[aeiou][^aeiou][a-z0-9]*"

  /** One Porter step: ordered rules, longest overlapping suffix
    * first. Applied as a PLAIN SEQUENTIAL FOLD on both sides — not
    * Porter's one-substitution-per-step — because the executor-side
    * alternative (an rlike/when chain re-referencing the upstream
    * expression per rule) multiplies the expression tree across steps
    * (~29k regex evals per token at 4 chained steps) and killed the
    * SparkContext through codegen blowup at sf0.1. The fold deviation
    * is narrow and documented: it can cascade within a step on
    * STACKED derivational suffixes (governmental → govern where
    * canonical Porter stops at government — one substitution per
    * step), which conflates strictly MORE related forms; the
    * canonical vocabulary in EngineSpec is unchanged by it, and
    * driver and executor share the exact same fold. */
  type StemStep = Seq[(String, String)]

  /** Porter step 2 (m>0): -ational→-ate family. Longest overlapping
    * suffixes first (ational before tional, ization before ation). */
  val PorterStep2: StemStep = Seq(
    s"^($M1)ational$$" -> "$1ate", s"^($M1)tional$$" -> "$1tion",
    s"^($M1)enci$$" -> "$1ence", s"^($M1)anci$$" -> "$1ance",
    s"^($M1)izer$$" -> "$1ize", s"^($M1)abli$$" -> "$1able",
    s"^($M1)alli$$" -> "$1al", s"^($M1)entli$$" -> "$1ent",
    s"^($M1)eli$$" -> "$1e", s"^($M1)ousli$$" -> "$1ous",
    s"^($M1)ization$$" -> "$1ize", s"^($M1)ation$$" -> "$1ate",
    s"^($M1)ator$$" -> "$1ate", s"^($M1)alism$$" -> "$1al",
    s"^($M1)iveness$$" -> "$1ive", s"^($M1)fulness$$" -> "$1ful",
    s"^($M1)ousness$$" -> "$1ous", s"^($M1)aliti$$" -> "$1al",
    s"^($M1)iviti$$" -> "$1ive", s"^($M1)biliti$$" -> "$1ble")

  /** Porter step 3 (m>0): -icate/-ative/-alize/-iciti/-ical/-ful/-ness. */
  val PorterStep3: StemStep = Seq(
    s"^($M1)icate$$" -> "$1ic", s"^($M1)ative$$" -> "$1",
    s"^($M1)alize$$" -> "$1al", s"^($M1)iciti$$" -> "$1ic",
    s"^($M1)ical$$" -> "$1ic", s"^($M1)ful$$" -> "$1",
    s"^($M1)ness$$" -> "$1")

  /** Porter step 4 (m>1): drop the derivational suffix outright. The
    * `ion` rule needs the [st]-final stem AND the measure counted over
    * a stem whose final consonant may BE that s/t — a lookahead gates
    * the measure over the whole pre-`ion` prefix, then the group pins
    * the [st]. Porter's own list order (ement before ment before ent). */
  val PorterStep4: StemStep = Seq(
    s"^($M2)al$$" -> "$1", s"^($M2)ance$$" -> "$1",
    s"^($M2)ence$$" -> "$1", s"^($M2)er$$" -> "$1",
    s"^($M2)ic$$" -> "$1", s"^($M2)able$$" -> "$1",
    s"^($M2)ible$$" -> "$1", s"^($M2)ant$$" -> "$1",
    s"^($M2)ement$$" -> "$1", s"^($M2)ment$$" -> "$1",
    s"^($M2)ent$$" -> "$1",
    "^(?=(?:[a-z0-9]*[aeiou][^aeiou]){2}[a-z0-9]*ion$)([a-z0-9]*[st])ion$" -> "$1",
    s"^($M2)ou$$" -> "$1", s"^($M2)ism$$" -> "$1",
    s"^($M2)ate$$" -> "$1", s"^($M2)iti$$" -> "$1",
    s"^($M2)ous$$" -> "$1", s"^($M2)ive$$" -> "$1",
    s"^($M2)ize$$" -> "$1")

  /** Porter step 5b (m>1): a final double-l loses one l — controll →
    * control, install → instal; roll (m=1) stays. The measure gate is
    * a LOOKAHEAD because the final ll is itself the last measure
    * pair's consonant run (a plain `(M2)l` capture could never align:
    * the pair consumes the first l). Runs AFTER 5a like the canonical
    * order; the step-1b doubled-consonant restoration deliberately
    * excludes l (Porter's *L exception), so -ll words reach this rule
    * intact (controlled → controll → control). */
  val PorterStep5b: StemStep = Seq(s"^(?=$M2)([a-z0-9]*l)l$$" -> "$1")

  /** The complete full-Porter rule sequence: step-1 rules (everything
    * in [[StemRules]] but the final-e drop), steps 2-4, then the
    * final-e drop — e-removal must come LAST (of the suffix steps) or
    * step 2-4 suffixes like -ize/-ate never match (centralize →
    * centraliz would keep its z) — then the 5b double-l reduction.
    * This closes the last named stemmer residual; only the
    * per-language stemmer zoo stays out (documented). */
  val FullStemRules: Seq[(String, String)] =
    StemRules.init ++ PorterStep2 ++ PorterStep3 ++ PorterStep4 ++
      (StemRules.last +: PorterStep5b)

  /** Driver-side FULL Porter — delegates to the ONE precompiled fold
    * ([[graft.functions.StemFull.stemString]]) the executor expression
    * also runs, so the two sides cannot drift by construction. */
  def stemFull(t: String): String =
    graft.functions.StemFull.stemString(t)

  /** Executor-side FULL Porter — a native expression making ONE static
    * call per token into the same precompiled fold (48 chained
    * regexp_replace nodes paid a UTF8String round-trip each; see
    * [[graft.functions.StemFullExpr]]). */
  def stemFullCol(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.StemFullExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(c)))
}
