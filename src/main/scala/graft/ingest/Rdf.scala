package graft.ingest

import graft.model.InfotonModel._
import java.sql.Timestamp

/** N-Triples / N-Quads parsing and the RDF → write-command mapping —
  * the read half of `POST /_in` (SURVEY.md §2.1, §3.2).
  *
  * Reference: InputHandler.scala:67,259 parses RDF with Jena and
  * LDFormatParser.rdfToInfotonsMap (LDFormatParser.scala:586-605) folds
  * statements into per-path field maps plus command directives
  * (`#markReplace`, `#fullDelete` in the `meta/sys` namespace).
  *
  * This engine ships no Jena (zero-egress build), so the line-oriented
  * N-Triples / N-Quads grammar is parsed directly — each line is one
  * statement, which makes the parse embarrassingly parallel: a
  * `mapPartitions` over `spark.read.text` with no cross-line state.
  * (Turtle/RDF-XML would need a real streaming parser; N-Triples and
  * N-Quads are the formats the reference's own bulk tools exchange.)
  *
  * Identity mapping (SURVEY.md §7.5 "one canonical field key"):
  *   subject IRI `proto://host/p/a/t/h` → infoton path `/host/p/a/t/h`
  *   (the reference's FReference.getCmwellPath, Infoton.scala:675-689);
  *   predicate IRI → canonical field key via the namespace claim
  *   registry ([[graft.qp.Namespaces]]) — bare local name for the
  *   first namespace using it, `local.$nsHash` for later colliding
  *   vocabularies.
  */
object Rdf {

  /** One parsed statement. Exactly one of `objIri`/`lit` is set. */
  final case class Statement(subj: String, pred: String,
                             objIri: Option[String], lit: Option[String],
                             dtype: Option[String], lang: Option[String],
                             quad: Option[String])

  /** `proto://rest` → `/rest`; already-path stays. */
  def iriToPath(iri: String): String =
    if (iri.startsWith("/")) iri
    else "/" + iri.replaceFirst("^[A-Za-z][A-Za-z0-9+.-]*://", "")

  /** IRI local name — after the last `#` or `/`. */
  def localName(iri: String): String =
    iri.substring(math.max(iri.lastIndexOf('#'), iri.lastIndexOf('/')) + 1)

  /** Stable per-document discriminator for generated blank-node labels:
    * parsers run independently per document inside one batch, so
    * per-document counters alone would collide across documents and
    * merge unrelated bnodes at the same synthetic path. Content-derived
    * (not random) so a re-parse of the same document yields the same
    * labels — uuid determinism is preserved. */
  def bnodeTag(doc: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(doc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(6).map("%02x".format(_)).mkString

  private def unescape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b.append('\n'); i += 2
          case 'r' => b.append('\r'); i += 2
          case 't' => b.append('\t'); i += 2
          case '"' => b.append('"'); i += 2
          case '\\' => b.append('\\'); i += 2
          case 'u' =>
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case 'U' =>
            b.appendAll(Character.toChars(
              Integer.parseInt(s.substring(i + 2, i + 10), 16)))
            i += 10
          case o => b.append(o); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Parse one N-Triples / N-Quads line; None for blank/comment lines.
    * Malformed lines throw (fail loud — silent drops corrupt a batch). */
  def parseLine(line: String): Option[Statement] = {
    val t = line.trim
    if (t.isEmpty || t.startsWith("#")) return None
    var i = 0
    def ws(): Unit = while (i < t.length && t.charAt(i).isWhitespace) i += 1
    def term(): (String, String, Option[String], Option[String]) = {
      // returns (kind: iri|blank|lit, value, dtype, lang)
      ws()
      t.charAt(i) match {
        case '<' =>
          val e = t.indexOf('>', i)
          require(e > i, s"unterminated IRI in: $t")
          val v = t.substring(i + 1, e); i = e + 1; ("iri", v, None, None)
        case '_' =>
          val s = i; while (i < t.length && !t.charAt(i).isWhitespace) i += 1
          ("blank", t.substring(s, i), None, None)
        case '"' =>
          // escape-aware scan: skip \x pairs so a literal ending in a
          // (correctly escaped) backslash doesn't hide the close quote
          var e = i + 1
          while (e < t.length && t.charAt(e) != '"') {
            if (t.charAt(e) == '\\') e += 2 else e += 1
          }
          require(e < t.length, s"unterminated literal in: $t")
          val v = unescape(t.substring(i + 1, e)); i = e + 1
          if (i + 1 < t.length && t.startsWith("^^<", i)) {
            val de = t.indexOf('>', i + 3)
            val d = t.substring(i + 3, de); i = de + 1
            ("lit", v, Some(d), None)
          } else if (i < t.length && t.charAt(i) == '@') {
            val s0 = i + 1
            while (i + 1 < t.length && !t.charAt(i + 1).isWhitespace) i += 1
            i += 1
            ("lit", v, None, Some(t.substring(s0, i)))
          } else ("lit", v, None, None)
        case c => throw new IllegalArgumentException(s"bad term '$c' in: $t")
      }
    }
    val (_, s, _, _) = term()
    val (pk, p, _, _) = term(); require(pk == "iri", s"predicate not IRI: $t")
    val (ok, o, dt, lg) = term()
    ws()
    val quad = if (i < t.length && t.charAt(i) != '.') {
      val (_, g, _, _) = term(); Some(g)
    } else None
    Some(Statement(s, p,
      objIri = if (ok == "lit") None else Some(o),
      lit = if (ok == "lit") Some(o) else None,
      // graph IRIs normalize to path form, matching the loader's quad
      // convention (and the formatter's output)
      dtype = dt, lang = lg, quad = quad.map(iriToPath)))
  }

  private val Xsd = "http://www.w3.org/2001/XMLSchema#"
  /** The command-directive namespace (reference `meta/sys` markers,
    * LDFormatParser.scala: markReplace / fullDelete handling). */
  val SysNs = "cmwell://meta/sys#"

  /** Statement object → typed field value (reference untyped-input
    * inference, Infoton.scala:539-543). */
  def toValue(st: Statement): Merger.FieldValue = st.objIri match {
    case Some(iri) =>
      Merger.FieldValue(iriToPath(iri), None, None, None, TRef, None, st.quad)
    case None =>
      val v = st.lit.get
      st.dtype.map(_.stripPrefix(Xsd)) match {
        case Some("integer") | Some("long") | Some("int") | Some("short") =>
          Merger.FieldValue(v, Some(v.toDouble), None, None, TLong, None, st.quad)
        case Some("double") | Some("decimal") | Some("float") =>
          Merger.FieldValue(v, Some(v.toDouble), None, None, TDouble, None, st.quad)
        case Some("boolean") =>
          Merger.FieldValue(v, None, None, Some(v.toBoolean), TBool, None, st.quad)
        case Some("dateTime") | Some("date") =>
          // xsd:dateTime allows a timezone-less form — parse as UTC then
          val lex = if (v.length == 10) v + "T00:00:00" else v
          val instant =
            try java.time.OffsetDateTime.parse(lex).toInstant
            catch { case _: java.time.format.DateTimeParseException =>
              java.time.LocalDateTime.parse(lex)
                .toInstant(java.time.ZoneOffset.UTC)
            }
          Merger.FieldValue(v, None, Some(Timestamp.from(instant)), None,
            TDate, None, st.quad)
        case _ =>
          Merger.FieldValue(v, None, None, None, TString, st.lang, st.quad)
      }
  }

  /** Fold one subject's statements into a write/update/delete command
    * (LDFormatParser.rdfToInfotonsMap semantics: markReplace fields are
    * dropped before the new values apply; fullDelete tombstones).
    *
    * `keyOf` maps a predicate IRI to its canonical field key — pass
    * the batch's claimed-key broadcast ([[Ingest]]); runs executor-side
    * so it must be a pure serialized map, never driver registry state. */
  def toCommand(path: String, sts: Seq[Statement], lastModified: Timestamp,
                keyOf: String => String = localName): Merger.Command = {
    val (sys, data) = sts.partition(_.pred.startsWith(SysNs))
    if (sys.exists(s => localName(s.pred) == "fullDelete"))
      Merger.Command("delete_path", path, lastModified, Map.empty, Map.empty)
    else {
      val replaced = sys.filter(s => localName(s.pred) == "markReplace")
        .flatMap(_.objIri).map(keyOf)
      // `#linkTo <target>` makes the subject a LinkInfoton
      // (Infoton.scala:269-304); the target lands in a linkTo field
      val linkTo = sys.filter(s => localName(s.pred) == "linkTo")
        .flatMap(_.objIri).map(iriToPath)
      val fields = data.groupBy(s => keyOf(s.pred))
        .map { case (f, ss) => f -> ss.map(toValue).distinct } ++
        (if (linkTo.nonEmpty) Map("linkTo" -> linkTo.map(p =>
          Merger.FieldValue(p, None, None, None, TRef, None, None)))
         else Map.empty)
      val op = if (replaced.nonEmpty) "update" else "write"
      Merger.Command(op, path, lastModified, fields,
        replaced.map(_ -> Seq.empty[Merger.FieldValue]).toMap,
        kind = if (linkTo.nonEmpty) KindLink else KindObject)
    }
  }
}
