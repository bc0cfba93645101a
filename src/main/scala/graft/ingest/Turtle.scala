package graft.ingest

/** Turtle subset parser → [[Rdf.Statement]]s (the `POST /_in`
  * `text/turtle` path; reference parses via Jena,
  * InputHandler.scala:259 — no Jena in this build).
  *
  * Supported: `@prefix`/`PREFIX`, IRIs, prefixed names, `a` (rdf:type),
  * `;` predicate lists, `,` object lists, string literals with
  * `^^datatype` / `@lang`, numeric and boolean shorthand literals,
  * comments. Not supported (throws): blank-node property lists `[...]`,
  * collections `(...)`, multi-line `\"\"\"` literals — the bulk-exchange
  * formats (N-Triples/N-Quads) cover those producers.
  *
  * Turtle is stateful (prefixes), so the unit of parallelism is one
  * document (e.g. one file via `wholeTextFiles`), not one line.
  */
object Turtle {

  private val Rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  private final class Lexer(s: String) {
    var i = 0
    def ws(): Unit = {
      while (i < s.length &&
        (s.charAt(i).isWhitespace || s.charAt(i) == '#')) {
        if (s.charAt(i) == '#') while (i < s.length && s.charAt(i) != '\n') i += 1
        else i += 1
      }
    }
    def eof: Boolean = { ws(); i >= s.length }
    def peek: Char = { ws(); s.charAt(i) }
    /** next token: IRI, pname, literal, keyword, or punctuation */
    def next(): String = {
      ws()
      val c = s.charAt(i)
      c match {
        case '<' =>
          val e = s.indexOf('>', i); require(e > 0, "unterminated IRI")
          val t = s.substring(i, e + 1); i = e + 1; t
        case '"' =>
          // escape-aware scan (see Rdf.parseLine): skip \x pairs
          var e = i + 1
          while (e < s.length && s.charAt(e) != '"') {
            if (s.charAt(e) == '\\') e += 2 else e += 1
          }
          require(e < s.length, "unterminated literal")
          var j = e + 1
          if (j + 1 < s.length && s.startsWith("^^", j)) {
            j += 2
            if (s.charAt(j) == '<') j = s.indexOf('>', j) + 1
            else while (j < s.length && !s.charAt(j).isWhitespace &&
              !";,.".contains(s.charAt(j))) j += 1
          } else if (j < s.length && s.charAt(j) == '@') {
            j += 1
            while (j < s.length && (s.charAt(j).isLetterOrDigit ||
              s.charAt(j) == '-')) j += 1
          }
          val t = s.substring(i, j); i = j; t
        case ';' | ',' | '.' | '[' | ']' | '(' | ')' => i += 1; c.toString
        case _ =>
          val st = i
          val numeric = c.isDigit || c == '+' || c == '-'
          def continues: Boolean = {
            val ch = s.charAt(i)
            if (ch.isWhitespace) false
            // a '.' continues a numeric literal (0.5) but ends a statement
            else if (ch == '.') numeric && i + 1 < s.length &&
              s.charAt(i + 1).isDigit
            else !";,<\"[]()".contains(ch)
          }
          while (i < s.length && continues) i += 1
          s.substring(st, i)
      }
    }
  }

  /** Parse one Turtle document into statements. */
  def parse(doc: String): Seq[Rdf.Statement] = {
    val lx = new Lexer(doc)
    var prefixes = Map.empty[String, String]
    val out = Vector.newBuilder[Rdf.Statement]

    def resolve(tok: String): String =
      if (tok.startsWith("<")) tok.stripPrefix("<").stripSuffix(">")
      else if (tok == "a") Rdf_type
      else {
        val idx = tok.indexOf(':')
        require(idx >= 0, s"not an IRI or pname: $tok")
        val (p, local) = (tok.take(idx), tok.drop(idx + 1))
        prefixes.get(p) match {
          case Some(ns) => ns + local
          case None => tok // already scheme-qualified (e.g. cmwell://...)
        }
      }

    def objTerm(tok: String, subj: String, pred: String): Rdf.Statement = {
      val Xsd = "http://www.w3.org/2001/XMLSchema#"
      if (tok.startsWith("\"")) {
        var e = 1
        while (tok.charAt(e) != '"') {
          if (tok.charAt(e) == '\\') e += 2 else e += 1
        }
        val body = tok.substring(1, e)
        val rest = tok.substring(e + 1)
        val (dt, lang) =
          if (rest.startsWith("^^"))
            (Some(resolve(rest.drop(2))), None)
          else if (rest.startsWith("@")) (None, Some(rest.drop(1)))
          else (None, None)
        Rdf.Statement(subj, pred, None, Some(unquote(body)), dt, lang, None)
      }
      else if (tok == "true" || tok == "false")
        Rdf.Statement(subj, pred, None, Some(tok),
          Some(Xsd + "boolean"), None, None)
      else if (tok.matches("[+-]?\\d+"))
        Rdf.Statement(subj, pred, None, Some(tok),
          Some(Xsd + "integer"), None, None)
      else if (tok.matches("[+-]?(\\d*\\.\\d+|\\d+)([eE][+-]?\\d+)?") &&
               (tok.contains(".") || tok.exists(c => c == 'e' || c == 'E')))
        // DECIMAL (dot) or DOUBLE (exponent form, incl. 1e5)
        Rdf.Statement(subj, pred, None, Some(tok),
          Some(Xsd + "decimal"), None, None)
      else Rdf.Statement(subj, pred, Some(resolve(tok)), None, None, None, None)
    }

    while (!lx.eof) {
      val t = lx.next()
      if (t.equalsIgnoreCase("@prefix") || t.equalsIgnoreCase("PREFIX")) {
        val p = lx.next().stripSuffix(":")
        val iri = lx.next().stripPrefix("<").stripSuffix(">")
        prefixes += p -> iri
        if (lx.peek == '.') lx.next()
      } else {
        require(t != "[" && t != "(",
          s"blank-node/collection syntax unsupported: $t")
        val subj = resolve(t)
        var more = true
        while (more) {
          val pred = resolve(lx.next())
          var moreObj = true
          while (moreObj) {
            out += objTerm(lx.next(), subj, pred)
            if (lx.peek == ',') lx.next() else moreObj = false
          }
          lx.peek match {
            case ';' =>
              lx.next()
              // trailing ; before . is legal
              if (lx.peek == '.') { lx.next(); more = false }
            case '.' => lx.next(); more = false
            case c => throw new IllegalArgumentException(s"expected ; or . got $c")
          }
        }
      }
    }
    out.result()
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
