package graft.ingest

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** JSON-LD parser → [[Rdf.Statement]]s — the `POST /_in`
  * `application/ld+json` path (the most common API-client format;
  * reference parses via Jena, InputHandler.scala:259 — no Jena in this
  * build, so the expansion algorithm subset is hand-rolled over
  * Jackson, which ships with Spark).
  *
  * Supported: `@context` (prefix → IRI strings, term → IRI strings,
  * `@vocab`), `@id`, `@type` (string or array), `@graph` (incl. a named
  * graph: an object with both `@id` and `@graph` quad-tags the nested
  * statements), property values as string / number / boolean,
  * `{"@id": …}` references, `{"@value": …, "@type"|"@language": …}`
  * typed literals, arrays, nested node objects (blank nodes get fresh
  * `_:j…` labels). Not supported (throws): `@list`, `@reverse`,
  * `@base`-relative IRIs, unresolvable property keys — a typo'd key
  * must not silently become a field name (same fail-loud policy as
  * [[Turtle]]).
  *
  * Like Turtle, the document is the unit of parallelism.
  */
object JsonLd {

  private val Rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  private val Xsd = "http://www.w3.org/2001/XMLSchema#"
  private val mapper = new ObjectMapper()

  /** Parse one JSON-LD document into statements. */
  def parse(doc: String): Seq[Rdf.Statement] =
    new Parser(Rdf.bnodeTag(doc)).run(mapper.readTree(doc))

  private final class Parser(docTag: String) {
    private var prefixes = Map.empty[String, String]
    private var terms = Map.empty[String, String]
    private var refPreds = Set.empty[String] // @type:@id-coerced term IRIs
    private var vocab: Option[String] = None
    private var bn = 0
    private val out = Vector.newBuilder[Rdf.Statement]

    // content-digest salt: batch-mates must not share bnode labels
    private def freshBnode(): String = { bn += 1; "_:j" + docTag + "b" + bn }

    private def context(ctx: JsonNode): Unit = {
      require(ctx.isObject, "@context must be an object in this subset")
      ctx.properties().asScala.foreach { e =>
        val (k, v) = (e.getKey, e.getValue)
        if (k == "@vocab") vocab = Some(v.asText())
        else if (k == "@base")
          throw new IllegalArgumentException(
            "@base-relative IRIs unsupported — emit absolute IRIs")
        else if (v.isTextual) {
          val iri = v.asText()
          // a mapping ending in # or / is a prefix; anything else is a
          // term alias (both resolve the same way, longest-wins below)
          if (iri.endsWith("#") || iri.endsWith("/")) prefixes += k -> iri
          else terms += k -> iri
        } else if (v.isObject && v.has("@id")) {
          val id = v.get("@id").asText()
          terms += k -> id
          // {"@type": "@id"} coerces string values of this term to IRIs
          if (Option(v.get("@type")).exists(_.asText() == "@id"))
            refPreds += id
        }
        else throw new IllegalArgumentException(s"unsupported @context entry $k")
      }
    }

    /** Resolve a key or @type/@id token to an IRI (fail-loud). */
    private def iri(tok: String): String =
      if (tok.startsWith("_:")) tok
      else if (tok.contains("://")) tok
      else terms.get(tok) match {
        case Some(t) => t
        case None =>
          val idx = tok.indexOf(':')
          if (idx > 0 && prefixes.contains(tok.take(idx)))
            prefixes(tok.take(idx)) + tok.drop(idx + 1)
          else vocab match {
            case Some(v) if idx < 0 => v + tok
            case _ => throw new IllegalArgumentException(
              s"unresolvable JSON-LD key/IRI '$tok'")
          }
      }

    /** One property value → statement(s); returns nothing (emits). */
    private def value(subj: String, pred: String, v: JsonNode,
                      quad: Option[String]): Unit = {
      if (v.isArray) v.elements().asScala.foreach(value(subj, pred, _, quad))
      else if (v.isTextual)
        out += (if (refPreds(pred)) // coerced term: the string IS an IRI
          Rdf.Statement(subj, pred, Some(v.asText()), None, None, None, quad)
        else
          Rdf.Statement(subj, pred, None, Some(v.asText()), None, None, quad))
      else if (v.isIntegralNumber)
        out += Rdf.Statement(subj, pred, None, Some(v.asText()),
          Some(Xsd + "integer"), None, quad)
      else if (v.isNumber)
        out += Rdf.Statement(subj, pred, None, Some(v.asText()),
          Some(Xsd + "double"), None, quad)
      else if (v.isBoolean)
        out += Rdf.Statement(subj, pred, None, Some(v.asText()),
          Some(Xsd + "boolean"), None, quad)
      else if (v.isObject) {
        if (v.has("@value")) {
          val lex = v.get("@value").asText()
          val dt = Option(v.get("@type")).map(t => iri(t.asText()))
          val lang = Option(v.get("@language")).map(_.asText())
          out += Rdf.Statement(subj, pred, None, Some(lex), dt, lang, quad)
        } else if (v.has("@list") || v.has("@reverse"))
          throw new IllegalArgumentException("@list/@reverse unsupported")
        else {
          // node object: a reference (and possibly nested properties)
          val target = node(v, quad)
          out += Rdf.Statement(subj, pred, Some(target), None, None, None, quad)
        }
      } else throw new IllegalArgumentException(s"bad JSON-LD value $v")
    }

    /** One node object → its subject IRI; emits its statements. */
    private def node(n: JsonNode, quad: Option[String]): String = {
      require(n.isObject, s"expected node object, got $n")
      if (n.has("@context")) context(n.get("@context"))
      val subj = Option(n.get("@id")).map(x => iri(x.asText()))
        .getOrElse(freshBnode())
      // a named graph: @id + @graph quad-tags the nested statements
      // (graph IRIs normalize to path form, the loader's convention)
      if (n.has("@graph")) {
        val g = if (n.has("@id")) Some(Rdf.iriToPath(subj)) else quad
        n.get("@graph").elements().asScala.foreach(node(_, g))
      }
      n.properties().asScala.foreach { e =>
        val (k, v) = (e.getKey, e.getValue)
        k match {
          case "@context" | "@id" | "@graph" => // handled above
          case "@type" =>
            val types = if (v.isArray) v.elements().asScala.toSeq else Seq(v)
            types.foreach(t => out += Rdf.Statement(subj, Rdf_type,
              Some(iri(t.asText())), None, None, None, quad))
          case key if key.startsWith("@") =>
            throw new IllegalArgumentException(s"unsupported keyword $key")
          case key => value(subj, iri(key), v, quad)
        }
      }
      subj
    }

    def run(root: JsonNode): Seq[Rdf.Statement] = {
      if (root.isArray) root.elements().asScala.foreach(node(_, None))
      else node(root, None)
      out.result()
    }
  }
}
