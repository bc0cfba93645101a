package graft.ingest

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import java.io.StringReader

/** TriX parser → [[Rdf.Statement]]s — the `POST /_in`
  * `application/trix` path (reference parses via Jena,
  * InputHandler.scala:259; no Jena in this build, so the subset is
  * hand-rolled over the JDK's StAX reader — streaming, no DOM).
  *
  * Grammar (W3C TriX note): `<TriX>` root → `<graph>` blocks, each an
  * optional leading `<uri>` graph NAME (normalized to path form, the
  * N-Quads rule) followed by `<triple>` elements of exactly three
  * terms: `<uri>`, `<id>` (blank node), `<plainLiteral [xml:lang]>`,
  * `<typedLiteral datatype="…">`. This is the inverse of
  * [[graft.ops.Formatters.trix]] (roundtrip-tested) plus named graphs.
  *
  * Like the other document formats, one document = one parse unit. */
object Trix {

  // XMLInputFactory is not specified thread-safe and parses run on
  // concurrent task threads — one factory per thread
  private val factory = ThreadLocal.withInitial[XMLInputFactory] { () =>
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  private final case class Term(kind: String, value: String,
                                dtype: Option[String], lang: Option[String])

  /** Parse one TriX document into statements. */
  def parse(doc: String): Seq[Rdf.Statement] = {
    val r = factory.get().createXMLStreamReader(new StringReader(doc))
    try {
    val out = Vector.newBuilder[Rdf.Statement]
    // content-digest salt: batch-mates must not share bnode labels
    val docTag = Rdf.bnodeTag(doc)

    def readText(): String = {
      val sb = new StringBuilder
      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.CHARACTERS |
               XMLStreamConstants.CDATA => sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => done = true
          case XMLStreamConstants.START_ELEMENT =>
            throw new IllegalArgumentException(
              s"unexpected element inside term: ${r.getLocalName}")
          case _ => ()
        }
      }
      sb.toString
    }

    def term(): Term = r.getLocalName match {
      case "uri" => Term("uri", readText(), None, None)
      case "id" => // document-scoped blank node label
        Term("id", "_:t" + docTag + readText(), None, None)
      case "plainLiteral" =>
        val lang = Option(r.getAttributeValue(
          "http://www.w3.org/XML/1998/namespace", "lang"))
          .orElse(Option(r.getAttributeValue(null, "lang")))
        Term("lit", readText(), None, lang)
      case "typedLiteral" =>
        val dt = Option(r.getAttributeValue(null, "datatype")).getOrElse(
          throw new IllegalArgumentException("typedLiteral needs datatype"))
        Term("lit", readText(), Some(dt), None)
      case o => throw new IllegalArgumentException(s"bad TriX term <$o>")
    }

    def triple(graph: Option[String]): Unit = {
      var terms = Vector.empty[Term]
      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => terms :+= term()
          case XMLStreamConstants.END_ELEMENT => done = true
          case _ => ()
        }
      }
      require(terms.length == 3, s"TriX triple needs 3 terms, got ${terms.length}")
      val Seq(s, p, o) = terms
      require(s.kind != "lit", "literal subject")
      require(p.kind == "uri", "predicate must be <uri>")
      out += (o.kind match {
        case "lit" => Rdf.Statement(s.value, p.value, None, Some(o.value),
          o.dtype, o.lang, graph)
        case _ => Rdf.Statement(s.value, p.value, Some(o.value),
          None, None, None, graph)
      })
    }

    def graphBlock(): Unit = {
      var graph: Option[String] = None
      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "triple" => triple(graph)
            case "uri" => // leading <uri> names the graph
              graph = Some(Rdf.iriToPath(readText()))
            case o => throw new IllegalArgumentException(
              s"bad element in <graph>: <$o>")
          }
          case XMLStreamConstants.END_ELEMENT => done = true
          case _ => ()
        }
      }
    }

    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "TriX" => ()
          case "graph" => graphBlock()
          case o => throw new IllegalArgumentException(
            s"bad top-level TriX element <$o>")
        }
        case _ => ()
      }
    }
    out.result()
    } finally r.close()
  }
}
