package graft.ingest

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import java.io.StringReader

/** RDF/XML parser → [[Rdf.Statement]]s — the `POST /_in`
  * `application/rdf+xml` path (reference parses via Jena,
  * InputHandler.scala:259; no Jena in this build, so the subset is
  * hand-rolled over the JDK's StAX reader — streaming, no DOM).
  *
  * Supported: `rdf:RDF` root, `rdf:Description` subjects (`rdf:about`),
  * typed node elements (`<ont:Customer rdf:about=…>` → rdf:type),
  * property elements with `rdf:resource`, `rdf:datatype`, `xml:lang`,
  * text content, nested node elements (fresh blank nodes when they
  * carry no `rdf:about`), `rdf:nodeID`. Not supported (throws):
  * `rdf:parseType` (Literal/Collection), `rdf:li`/containers,
  * reification attributes — the bulk formats cover those producers.
  *
  * Like Turtle/JSON-LD, the document is the unit of parallelism. */
object RdfXml {

  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  // XMLInputFactory is not specified thread-safe and parses run on
  // concurrent task threads — one factory per thread
  private val factory = ThreadLocal.withInitial[XMLInputFactory] { () =>
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  /** Parse one RDF/XML document into statements. */
  def parse(doc: String): Seq[Rdf.Statement] = {
    val r = factory.get().createXMLStreamReader(new StringReader(doc))
    try {
    val out = Vector.newBuilder[Rdf.Statement]
    var bn = 0
    // content-digest salt: batch-mates must not share bnode labels
    val docTag = Rdf.bnodeTag(doc)
    def freshBnode(): String = { bn += 1; "_:x" + docTag + "b" + bn }

    def attr(local: String): Option[String] =
      Option(r.getAttributeValue(RdfNs, local))

    def rejectUnsupported(): Unit = {
      if (attr("parseType").isDefined)
        throw new IllegalArgumentException("rdf:parseType unsupported")
    }

    def elemIri(): String = {
      val ns = Option(r.getNamespaceURI).getOrElse("")
      ns + r.getLocalName
    }

    /** Inside a node element: read its property elements until the node
      * closes; returns when the matching END_ELEMENT is consumed. */
    def properties(subj: String): Unit = {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val pred = elemIri()
            rejectUnsupported()
            if (pred == RdfNs + "li")
              throw new IllegalArgumentException("rdf:li/containers unsupported")
            val resource = attr("resource")
            val nodeId = attr("nodeID")
            val dtype = attr("datatype")
            val lang = Option(r.getAttributeValue(
              "http://www.w3.org/XML/1998/namespace", "lang"))
            if (resource.isDefined || nodeId.isDefined) {
              val target = resource.getOrElse("_:" + nodeId.get)
              out += Rdf.Statement(subj, pred, Some(target),
                None, None, None, None)
              skipToEnd()
            } else {
              // text literal or a nested node element
              val text = new StringBuilder
              var done = false
              var nested = false
              while (!done && r.hasNext) {
                r.next() match {
                  case XMLStreamConstants.CHARACTERS |
                       XMLStreamConstants.CDATA =>
                    text.append(r.getText)
                  case XMLStreamConstants.START_ELEMENT =>
                    // nested node element — its subject is the object
                    nested = true
                    val target = node()
                    out += Rdf.Statement(subj, pred, Some(target),
                      None, None, None, None)
                  case XMLStreamConstants.END_ELEMENT => done = true
                  case _ =>
                }
              }
              if (!nested)
                out += Rdf.Statement(subj, pred, None, Some(text.toString),
                  dtype, lang, None)
            }
          case XMLStreamConstants.END_ELEMENT => return
          case _ =>
        }
      }
    }

    def skipToEnd(): Unit = {
      var depth = 1
      while (depth > 0 && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => depth += 1
          case XMLStreamConstants.END_ELEMENT => depth -= 1
          case _ =>
        }
      }
    }

    /** At a node element's START_ELEMENT: read it fully, emit its
      * statements, return its subject. */
    def node(): String = {
      val name = elemIri()
      rejectUnsupported()
      val subj = attr("about")
        .orElse(attr("nodeID").map("_:" + _))
        .getOrElse(freshBnode())
      // a typed node element asserts rdf:type (reference Jena behavior)
      if (name != RdfNs + "Description")
        out += Rdf.Statement(subj, RdfNs + "type", Some(name),
          None, None, None, None)
      properties(subj)
      subj
    }

    // document loop: find rdf:RDF, then each top-level node element
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          if (elemIri() == RdfNs + "RDF") {
            // children are node elements
            var open = true
            while (open && r.hasNext) {
              r.next() match {
                case XMLStreamConstants.START_ELEMENT => node()
                case XMLStreamConstants.END_ELEMENT => open = false
                case _ =>
              }
            }
          } else node() // a bare node element without the rdf:RDF wrapper
        case _ =>
      }
    }
    out.result()
    } finally r.close()
  }
}
