package graft.ingest

/** Turtle/TriG parser → [[Rdf.Statement]]s (the `POST /_in`
  * `text/turtle` / `application/trig` paths; reference parses via
  * Jena, InputHandler.scala:259 — no Jena in this build).
  *
  * Supported: `@prefix`/`PREFIX`, IRIs, prefixed names, `a` (rdf:type),
  * `;` predicate lists, `,` object lists, string literals with
  * `^^datatype` / `@lang`, multi-line `"""` literals, numeric and
  * boolean shorthand literals, blank-node labels `_:x`, blank-node
  * property lists `[...]`, collections `(...)` (expanded to
  * rdf:first/rdf:rest chains), comments, and TriG graph blocks —
  * `GRAPH <g> { … }`, `<g> { … }`, and the default-graph `{ … }`
  * (statements inside carry the graph normalized to path form, same
  * rule as the N-Quads parser). Turtle is the no-blocks subset, so one
  * parser serves both. Not supported (throws): `@base`-relative IRIs —
  * the reference's bulk tools always emit absolute IRIs; bnode graph
  * labels `[] { … }`.
  *
  * Unresolved single-colon prefixed names THROW (fail-loud policy): a
  * typo'd prefix must not silently become a field name. Only genuinely
  * scheme-qualified tokens (`cmwell://...`) pass through.
  *
  * Turtle is stateful (prefixes), so the unit of parallelism is one
  * document (e.g. one file via `wholeTextFiles`), not one line.
  */
object Turtle {

  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val Rdf_type = RdfNs + "type"
  private val Rdf_first = RdfNs + "first"
  private val Rdf_rest = RdfNs + "rest"
  private val Rdf_nil = RdfNs + "nil"
  private val Xsd = "http://www.w3.org/2001/XMLSchema#"

  /** Parse one Turtle document into statements. */
  def parse(doc: String): Seq[Rdf.Statement] = new Parser(doc).document()

  /** N3 entry (`text/n3`): the reference hands N3 to Jena, whose
    * reader treats it as Turtle — same routing here, but N3-PROPER
    * constructs (quantifiers, formulas, implication) are detected up
    * front and fail loud instead of being mis-read (an N3 formula
    * `{ … } => { … }` would otherwise lex as a TriG default-graph
    * block and silently assert its antecedent). Literal and IRI spans
    * are stripped before the scan so payload text can't false-match. */
  def parseN3(doc: String): Seq[Rdf.Statement] = {
    // IRI scrub must not cross whitespace or a second '<': a greedy
    // <[^>]*> would let the '<' of an N3 '<=' marker swallow up to the
    // next real IRI's '>' and smuggle the implication past the guard
    val scrubbed = doc
      .replaceAll("(?s)\"\"\".*?\"\"\"|'''.*?'''", " ")
      .replaceAll("\"(?:\\\\.|[^\"\\\\])*\"|'(?:\\\\.|[^'\\\\])*'", " ")
      .replaceAll("<[^<>\\s]*>", " ")
    for (marker <- Seq("@forAll", "@forSome", "=>", "<=", "@keywords"))
      require(!scrubbed.contains(marker),
        s"N3-proper syntax '$marker' is not supported: this engine " +
          "(like the reference's Jena routing) reads N3 as Turtle")
    parse(doc)
  }

  private final class Parser(src: String) {
    private var i = 0
    private var prefixes = Map.empty[String, String]
    private var bn = 0
    // TriG graph context: statements inside a graph block carry the
    // label, normalized to path form (the N-Quads parser's rule)
    private var curGraph: Option[String] = None
    private val out = Vector.newBuilder[Rdf.Statement]

    // labels are salted with a content digest: documents parse
    // independently (possibly in one batch), so per-document counters
    // alone would collide across documents and merge unrelated bnodes
    private val docTag = Rdf.bnodeTag(src)
    private def freshBnode(): String = { bn += 1; "_:g" + docTag + "b" + bn }

    private def ws(): Unit = {
      while (i < src.length &&
        (src.charAt(i).isWhitespace || src.charAt(i) == '#')) {
        if (src.charAt(i) == '#')
          while (i < src.length && src.charAt(i) != '\n') i += 1
        else i += 1
      }
    }
    private def eof: Boolean = { ws(); i >= src.length }
    private def peek: Char = { ws(); src.charAt(i) }
    private def expect(c: Char): Unit = {
      ws()
      require(i < src.length && src.charAt(i) == c,
        s"expected '$c' at offset $i")
      i += 1
    }

    /** Bare word / pname / IRI token (not literals or punctuation). */
    private def nextToken(): String = {
      ws()
      if (src.charAt(i) == '<') {
        val e = src.indexOf('>', i); require(e > 0, "unterminated IRI")
        val t = src.substring(i, e + 1); i = e + 1; t
      } else {
        val st = i
        val numeric = {
          val c = src.charAt(i); c.isDigit || c == '+' || c == '-'
        }
        def continues: Boolean = {
          val ch = src.charAt(i)
          if (ch.isWhitespace) false
          // a '.' continues a numeric literal (0.5) but ends a statement
          else if (ch == '.') numeric && i + 1 < src.length &&
            src.charAt(i + 1).isDigit
          else !";,<\"[](){}".contains(ch)
        }
        while (i < src.length && continues) i += 1
        require(i > st, s"empty token at offset $st")
        src.substring(st, i)
      }
    }

    private def resolve(tok: String): String =
      if (tok.startsWith("<")) tok.stripPrefix("<").stripSuffix(">")
      else if (tok == "a") Rdf_type
      else if (tok.startsWith("_:")) tok // blank-node label
      else {
        val idx = tok.indexOf(':')
        require(idx >= 0, s"not an IRI or pname: $tok")
        prefixes.get(tok.take(idx)) match {
          case Some(ns) => ns + tok.drop(idx + 1)
          case None =>
            // only genuinely scheme-qualified tokens pass through; an
            // unregistered single-colon prefix is a typo — fail loud
            require(tok.regionMatches(idx, "://", 0, 3),
              s"unresolved prefix '${tok.take(idx)}:' in $tok")
            tok
        }
      }

    /** Scan a (short or long) string literal + optional ^^dt / @lang;
      * emits nothing — returns the statement for (subj, pred). */
    private def literal(subj: String, pred: String): Rdf.Statement = {
      val long = src.startsWith("\"\"\"", i)
      val body =
        if (long) {
          var e = i + 3
          while (e < src.length && !src.startsWith("\"\"\"", e)) {
            if (src.charAt(e) == '\\') e += 2 else e += 1
          }
          require(e < src.length, "unterminated long literal")
          val b = src.substring(i + 3, e); i = e + 3; b
        } else {
          var e = i + 1
          while (e < src.length && src.charAt(e) != '"') {
            if (src.charAt(e) == '\\') e += 2 else e += 1
          }
          require(e < src.length, "unterminated literal")
          val b = src.substring(i + 1, e); i = e + 1; b
        }
      val (dt, lang) =
        if (src.startsWith("^^", i)) {
          i += 2
          (Some(resolve(nextToken())), None)
        } else if (i < src.length && src.charAt(i) == '@') {
          val s0 = i + 1
          i += 1
          while (i < src.length && (src.charAt(i).isLetterOrDigit ||
            src.charAt(i) == '-')) i += 1
          (None, Some(src.substring(s0, i)))
        } else (None, None)
      Rdf.Statement(subj, pred, None, Some(unquote(body)), dt, lang, curGraph)
    }

    /** One object for (subj, pred) — emits the statement(s), including
      * any nested blank-node property list or collection. */
    private def objectTerm(subj: String, pred: String): Unit = peek match {
      case '[' =>
        i += 1
        val b = freshBnode()
        if (peek != ']') predicateObjectList(b)
        expect(']')
        out += Rdf.Statement(subj, pred, Some(b), None, None, None, curGraph)
      case '(' =>
        val head = collection()
        out += Rdf.Statement(subj, pred, Some(head), None, None, None, curGraph)
      case '"' =>
        out += literal(subj, pred)
      case _ =>
        val tok = nextToken()
        out += (
          if (tok == "true" || tok == "false")
            Rdf.Statement(subj, pred, None, Some(tok),
              Some(Xsd + "boolean"), None, curGraph)
          else if (tok.matches("[+-]?\\d+"))
            Rdf.Statement(subj, pred, None, Some(tok),
              Some(Xsd + "integer"), None, curGraph)
          else if (tok.matches("[+-]?(\\d*\\.\\d+|\\d+)([eE][+-]?\\d+)?") &&
                   (tok.contains(".") || tok.exists(c => c == 'e' || c == 'E')))
            // DECIMAL (dot) or DOUBLE (exponent form, incl. 1e5)
            Rdf.Statement(subj, pred, None, Some(tok),
              Some(Xsd + "decimal"), None, curGraph)
          else Rdf.Statement(subj, pred, Some(resolve(tok)),
            None, None, None, curGraph))
    }

    /** `( e1 e2 ... )` → rdf:first/rdf:rest cells; returns the head
      * node (rdf:nil for the empty collection). */
    private def collection(): String = {
      expect('(')
      if (peek == ')') { i += 1; return Rdf_nil }
      var head: String = null
      var prev: String = null
      while (peek != ')') {
        val cell = freshBnode()
        if (prev == null) head = cell
        else out += Rdf.Statement(prev, Rdf_rest, Some(cell),
          None, None, None, curGraph)
        objectTerm(cell, Rdf_first)
        prev = cell
      }
      i += 1 // ')'
      out += Rdf.Statement(prev, Rdf_rest, Some(Rdf_nil), None, None, None, curGraph)
      head
    }

    private def objectList(subj: String, pred: String): Unit = {
      var more = true
      while (more) {
        objectTerm(subj, pred)
        if (peek == ',') i += 1 else more = false
      }
    }

    private def predicateObjectList(subj: String): Unit = {
      var more = true
      while (more) {
        val pred = resolve(nextToken())
        objectList(subj, pred)
        if (peek == ';') {
          i += 1
          // trailing ; before . or ] is legal
          if (peek == '.' || peek == ']') more = false
        } else more = false
      }
    }

    private def triples(inBlock: Boolean = false): Unit = {
      // only a blank-node property list may stand alone as the whole
      // statement (Turtle grammar [6]); a bare IRI/collection subject
      // with no predicate-object list is a syntax error and must not
      // silently emit nothing
      val standalone = peek == '['
      val subj = peek match {
        case '[' =>
          i += 1
          val b = freshBnode()
          if (peek != ']') predicateObjectList(b)
          expect(']')
          b
        case '(' => collection()
        case _ => resolve(nextToken())
      }
      if (peek != '.' && !(inBlock && peek == '}'))
        predicateObjectList(subj)
      else require(standalone,
        s"subject $subj has no predicate-object list")
      // TriG: the final triple of a graph block may omit its '.'
      if (inBlock && peek == '}') () else expect('.')
    }

    /** TriG graph block: statements inside carry `label` (path-
      * normalized), restoring the enclosing graph on '}'. */
    private def graphBlock(label: Option[String]): Unit = {
      expect('{')
      val saved = curGraph
      curGraph = label.map(Rdf.iriToPath)
      while (peek != '}') triples(inBlock = true)
      i += 1 // '}'
      curGraph = saved
    }

    def document(): Seq[Rdf.Statement] = {
      while (!eof) {
        // peek a word without consuming punctuation-introduced subjects
        if (peek == '{') graphBlock(None) // TriG default-graph block
        else if (peek != '[' && peek != '(') {
          val save = i
          val t = nextToken()
          if (t.equalsIgnoreCase("@prefix") || t.equalsIgnoreCase("PREFIX")) {
            val p = nextToken().stripSuffix(":")
            val iri = nextToken().stripPrefix("<").stripSuffix(">")
            prefixes += p -> iri
            if (!eof && peek == '.') i += 1
          } else if (t.equalsIgnoreCase("@base") || t.equalsIgnoreCase("BASE")) {
            throw new IllegalArgumentException(
              "@base-relative IRIs unsupported — emit absolute IRIs")
          } else if (t.equalsIgnoreCase("GRAPH")) {
            graphBlock(Some(resolve(nextToken()))) // GRAPH <g> { … }
          } else if (!eof && peek == '{') {
            graphBlock(Some(resolve(t))) // labeled block: <g> { … }
          } else { i = save; triples() }
        } else triples()
      }
      out.result()
    }
  }

  private def unquote(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b.append('\n'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'r' => b.append('\r'); i += 2
          case '"' => b.append('"'); i += 2
          case '\\' => b.append('\\'); i += 2
          case 'u' =>
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case o => b.append(o); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }
}
