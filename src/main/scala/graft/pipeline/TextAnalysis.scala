package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID, fingerprinting.
  *
  * All pure `Column` expressions (whole-stage codegen; no UDFs): at
  * 100 TB these run as a single projection over the scan with nothing
  * to shuffle.
  */
object TextAnalysis {

  /** Lowercase alnum tokens, empties dropped — the shared tokenizer
    * (same contract as the Contains-filter analyzer). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Word-level n-gram shingles as strings (n ≥ 1). */
  def shingles(text: Column, n: Int): Column = {
    val ts = tokens(text)
    if (n == 1) array_distinct(ts)
    else when(size(ts) >= n, array_distinct(
        transform(sequence(lit(0), size(ts) - n),
          i => array_join(slice(ts, i + lit(1), lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Token/char counts + BPE-ish subword estimate (≈ chars/4 like the
    * common BPE rule of thumb, plus one per word boundary). */
  def tokenStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val ts = tokens(col(textCol))
    docs.select(col("doc_id"),
      size(ts).as("n_tokens"),
      length(col(textCol)).as("n_chars"),
      size(array_distinct(ts)).as("n_distinct_tokens"),
      floor(length(regexp_replace(col(textCol), "\\s+", "")) / lit(4) +
        size(ts)).as("bpe_token_estimate"))
  }

  private val StopwordsEn =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")

  /** Quality signals: length, stopword ratio, punctuation ratio, mean
    * word length, repetition (1 - distinct/total). Ratios are plain
    * int/int divisions so they are bit-identical across engines. */
  def quality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val ts = tokens(col(textCol))
    val nTok = size(ts).cast("double")
    val stopArr = array(StopwordsEn.map(lit): _*)
    docs.select(col("doc_id"),
      size(ts).as("n_tokens"),
      (size(filter(ts, t => array_contains(stopArr, t))).cast("double") /
        nTok).as("stopword_ratio"),
      (length(regexp_replace(col(textCol), "[a-zA-Z0-9\\s]", "")) * lit(1.0) /
        length(col(textCol))).as("punct_ratio"),
      ((length(regexp_replace(col(textCol), "\\s+", "")) * lit(1.0)) / nTok)
        .as("mean_word_len"),
      (lit(1.0) - size(array_distinct(ts)).cast("double") / nTok)
        .as("repetition"))
  }

  /** Stopword profiles for the n-gram/stopword language-ID heuristic. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est"))

  /** Language-ID: score = matching-stopword count per language; argmax
    * with alphabetical tie-break; 'und' (undetermined) when no profile
    * matches at all. */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val ts = tokens(col(textCol))
    val scored = LangProfiles.foldLeft(docs.select(col("doc_id"), ts.as("ts"))) {
      case (df, (lang, words)) =>
        val arr = array(words.map(lit): _*)
        df.withColumn(s"score_$lang",
          size(filter(col("ts"), t => array_contains(arr, t))))
    }
    val best = LangProfiles.map { case (l, _) => col(s"score_$l") }
      .reduce((a, b) => greatest(a, b))
    val guess = LangProfiles.foldRight(lit("und")) { case ((l, _), acc) =>
      when(col(s"score_$l") === col("best") && col("best") > 0, lit(l))
        .otherwise(acc)
    }
    scored.withColumn("best", best)
      .withColumn("lang_guess", guess)
      .select("doc_id", "lang_guess")
  }

  /** Rolling-hash (Karp-Rabin-style) document fingerprint over the
    * token stream: acc = (acc*1000003 + (ascii(t)*131 + len(t))) mod
    * 2^31-1. The per-token hash is deliberately portable (plain
    * arithmetic) so an external verifier can recompute it. */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val hs = transform(tokens(col(textCol)),
      t => (ascii(t) * lit(131L) + length(t)).cast("long"))
    docs.select(col("doc_id"),
      aggregate(hs, lit(0L),
        (acc, h) => (acc * lit(1000003L) + h) % lit(2147483647L))
        .as("fingerprint"))
  }

  /** Corpus vocabulary: per-term total frequency and document
    * frequency, top `k` by frequency (term tie-break). The tokenizer-
    * training / frequency-analysis staple — one explode + one groupBy
    * (map-side partial counts; doc_freq via per-doc distinct BEFORE
    * the shuffle, so the exchanged rows are (term, doc) distinct, not
    * every occurrence). */
  def vocabulary(docs: DataFrame, k: Int = 100,
                 textCol: String = "text"): DataFrame = {
    val tf = docs
      .select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
    val df0 = docs
      .select(col("doc_id"), explode(array_distinct(tokens(col(textCol))))
        .as("term"))
      .groupBy("term").agg(count(lit(1)).as("doc_freq"))
    tf.join(df0, Seq("term"))
      .orderBy(col("freq").desc, col("term").asc)
      .limit(k)
  }
}
