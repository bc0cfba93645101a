package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for large-scale training-data pipelines:
  * per-source quota sampling, PII redaction, benchmark
  * decontamination. Like [[TextAnalysis]], everything is pure
  * `Column` expressions or single-shuffle relational shapes — no UDFs,
  * nothing driver-side.
  */
object Curation {

  /** Per-key QUOTA SAMPLING — keep at most `quota` documents per key
    * (domain/source caps, the standard training-mix lever). Selection
    * is a deterministic pseudo-random order (md5 of the doc id, ties
    * by id) so the sample is reproducible AND unbiased w.r.t. corpus
    * order — taking the FIRST n per key would bias toward whatever the
    * upstream sort was.
    *
    * Scale: one shuffle on the key; the window sorts per key-partition.
    * A pathologically hot key pays its full sort before the filter —
    * at 100 TB, pre-prune hot keys with an approximate count and a
    * per-partition local top-`quota` pass first (two-phase top-K); the
    * quota output itself is bounded at keys × quota rows. */
  def quotaSample(docs: DataFrame, keyCol: String,
                  quota: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= quota).drop("__rn")
  }

  /** PII patterns, applied in declaration order. Kept to syntax that
    * means the same thing in Java regex and RE2-family engines (no
    * lookaround, no backrefs) so an external validator reproduces the
    * redaction bit-for-bit. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")

  /** PII REDACTION: replace each pattern with its `[TYPE]` token and
    * count per-type hits (counted on the ORIGINAL text, so one
    * pattern's replacement can't hide another's count). One codegen'd
    * projection — at 100 TB this is scan-speed. */
  def redact(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val redacted = PiiPatterns.foldLeft(col(textCol)) {
      case (c, (name, p)) =>
        regexp_replace(c, p, s"[${name.toUpperCase}]")
    }
    val counts = PiiPatterns.map { case (name, p) =>
      regexp_count(col(textCol), lit(p)).as(s"n_$name")
    }
    docs.select(col("doc_id") +: redacted.as("redacted") +: counts: _*)
  }

  /** Benchmark DECONTAMINATION: flag every document sharing at least
    * one word `n`-gram with a benchmark/eval text set — the standard
    * leakage guard before training. The benchmark gram set is tiny
    * relative to the corpus (eval suites, not corpora), so the join is
    * a broadcast semi-join against the exploded corpus gram index: the
    * corpus streams once, nothing shuffles.
    *
    * Returns the distinct flagged doc ids; the clean set is
    * `docs.join(contaminated, "doc_id", "left_anti")`. */
  def contaminated(docs: DataFrame, bench: DataFrame, n: Int,
                   textCol: String = "text"): DataFrame = {
    val grams = docs.select(col("doc_id"),
      explode(TextAnalysis.shingles(col(textCol), n)).as("g"))
    val bg = bench
      .select(explode(TextAnalysis.shingles(col(textCol), n)).as("g"))
      .distinct()
    grams.join(broadcast(bg), Seq("g"), "left_semi")
      .select("doc_id").distinct()
  }
}
