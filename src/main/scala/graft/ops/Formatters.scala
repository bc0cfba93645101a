package graft.ops

import graft.model.InfotonModel._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Output formatters (SURVEY.md §2.1) — every formatter is a pure
  * row→string projection (one codegen'd `select`, no shuffle), so a
  * 100 TB export is scan + write at full parallelism.
  *
  * Reference: cmwell-formats FormatExtractor.scala:21-76 dispatches to
  * JsonFormatter / CSVFormatter / RDFFormatter; nt/nq are the formats
  * the reference's own data-tools exchange, and the ones
  * [[graft.ingest.Rdf]] re-ingests (roundtrip-tested).
  */
object Formatters {

  /** N-Triples string-literal escaping. */
  private def ntEscape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(c, "\\\\", "\\\\\\\\"),
      "\"", "\\\\\""), "\n", "\\\\n"), "\r", "\\\\r"), "\t", "\\\\t")

  private val XsdByType = Map(
    TInt -> "int", TLong -> "long", TDouble -> "double", TFloat -> "float",
    TBool -> "boolean", TDate -> "dateTime")

  /** Path → subject IRI: `/a/b` + protocol `p` → `p://a/b`
    * (inverse of Rdf.iriToPath; reference RDFFormatter emits
    * `<protocol>://<path>`). */
  def pathToIri(protocol: Column, path: Column): Column =
    concat(protocol, lit(":/"), path)

  /** One N-Triples (or N-Quads, when the value carries a quad) line per
    * (infoton, field, value). Returns a single-column ("line") frame. */
  def ntriples(infotons: DataFrame): DataFrame = {
    val x = infotons
      .where(col("fields").isNotNull)
      .select(col("system.protocol").as("protocol"), col("system.path").as("path"),
        explode(col("fields")).as(Seq("field", "values")))
      .select(col("protocol"), col("path"), col("field"),
        explode(col("values")).as("v"))
    val obj = {
      val v = col("v")
      val lit_ = concat(lit("\""), ntEscape(v.getField("s")), lit("\""))
      when(v.getField("vType") === TRef,
          concat(lit("<"), pathToIri(col("protocol"), v.getField("s")), lit(">")))
        .when(v.getField("vType") === TString,
          when(v.getField("lang").isNotNull,
            concat(lit_, lit("@"), v.getField("lang"))).otherwise(lit_))
        .otherwise(concat(lit_, lit("^^<http://www.w3.org/2001/XMLSchema#"),
          element_at(map(XsdByType.flatMap { case (k, x) =>
            Seq(lit(k), lit(x)) }.toSeq: _*), v.getField("vType")),
          lit(">")))
    }
    x.select(concat(
      lit("<"), pathToIri(col("protocol"), col("path")), lit("> "),
      lit("<cmwell://ont#"), col("field"), lit("> "),
      obj,
      when(col("v.quad").isNotNull,
        concat(lit(" <"), col("v.quad"), lit(">"))).otherwise(lit("")),
      lit(" .")).as("line"))
  }

  /** `format=text` — one path per line (FormatExtractor's text). */
  def text(infotons: DataFrame): DataFrame =
    infotons.select(col("system.path").as("line"))

  /** JSON-lines — one infoton per line (the reference's jsonl). */
  def jsonl(infotons: DataFrame): DataFrame =
    infotons.select(to_json(struct(col("system"), col("fields"))).as("line"))

  /** csv/tsv with an explicit column list (reference CSVFormatter
    * computes the union of field names; pass [[fieldNames]] for that).
    * First value per field, lexical form. */
  def csv(infotons: DataFrame, fields: Seq[String],
          sep: String = ","): DataFrame = {
    val cols = col("system.path") +: fields.map(f =>
      coalesce(element_at(col("fields").getItem(f), 1).getField("s"), lit("")))
    val quoted = cols.map(c =>
      when(c.contains(sep) || c.contains("\"") || c.contains("\n"),
        concat(lit("\""), regexp_replace(c, "\"", "\"\""), lit("\"")))
        .otherwise(c))
    infotons.select(concat_ws(sep, quoted: _*).as("line"))
  }

  /** YAML — one document per infoton (reference YamlFormatter):
    * system block + fields with first-value lexical forms. */
  def yaml(infotons: DataFrame): DataFrame = {
    // coalesce each system field: a null (synthesized parents, /proc
    // virtual infotons) must still render its key — every document
    // keeps the same shape
    val sys = Seq("path", "parent", "uuid", "kind").map(f =>
      concat(lit(s"  $f: "), coalesce(col(s"system.$f"), lit(""))))
    val fieldLines = transform(map_entries(col("fields")),
      e => concat(lit("  "), e.getField("key"), lit(": "),
        e.getField("value").getItem(0).getField("s")))
    infotons.select(concat(
      lit("---\nsystem:\n"), concat_ws("\n", sys: _*),
      lit("\nfields:\n"),
      when(col("fields").isNotNull, array_join(fieldLines, "\n"))
        .otherwise(lit("")))
      .as("doc"))
  }

  /** Atom feed entries (reference AtomFormatter): one `<entry>` per
    * infoton; wrap with [[atomFeed]] head/tail for a full feed. */
  def atomEntries(infotons: DataFrame): DataFrame =
    infotons.select(concat(
      lit("<entry><id>"), xmlEscape(col("system.path")),
      lit("</id><title>"), xmlEscape(col("system.path")),
      lit("</title><updated>"),
      date_format(col("system.lastModified"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
      lit("</updated></entry>")).as("line"))

  def atomFeed(title: String): (String, String) =
    (s"""<?xml version="1.0" encoding="UTF-8"?>""" +
      s"""<feed xmlns="http://www.w3.org/2005/Atom"><title>$title</title>""",
      "</feed>")

  private def xmlEscape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  /** Union of field names over a frame — the csv header dictionary
    * (small: distinct predicate names, same cardinality class as the
    * reference's /meta/ns). */
  def fieldNames(infotons: DataFrame): Seq[String] =
    infotons.select(explode(map_keys(col("fields"))).as("f"))
      .distinct().orderBy("f").collect().map(_.getString(0)).toSeq
}
