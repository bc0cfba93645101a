package graft.sparql

import graft.ingest.Rdf
import graft.model.{GraftStore, InfotonModel}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SPARQL SELECT over the store — the `_sp`/`_sparql` query surface
  * (SURVEY.md §2.3, §3.3).
  *
  * Reference: SpHandler.scala:360-475 populates a Jena model and runs
  * ARQ; the whole-graph `_sparql` variant compiles each BGP triple
  * pattern to index lookups with hand-rolled cardinality ordering
  * (JenaArqExtensions.scala:66-170, TripleStore.scala:45-130).
  *
  * Spark-first shape: the `quads` view IS the triple store, so a BGP
  * compiles directly to relational algebra — each triple pattern is a
  * predicate-filtered scan of `quads`, shared variables become equi-join
  * keys, OPTIONAL is a left outer join, FILTER a `where`, SELECT a
  * projection. Catalyst + AQE then do what the reference's
  * SortingAndMappingStageGenerator hand-rolls: join reordering by
  * observed cardinality. No Jena, no collect — a BGP over 100 TB of
  * quads is just an N-way join Spark already knows how to shuffle.
  *
  * Supported subset: PREFIX, SELECT (DISTINCT) ?v…, WHERE { basic
  * patterns, OPTIONAL { … }, FILTER (comparisons ∧/∨) }, ORDER BY,
  * LIMIT. Variables bind subjects, predicates or objects; object
  * variables carry a numeric shadow column (`<v>__n`) so FILTER
  * comparisons run typed, never on strings.
  */
object Sparql {

  sealed trait Term
  final case class V(name: String) extends Term
  final case class I(iri: String) extends Term
  final case class L(lex: String, numeric: Option[Double]) extends Term

  final case class Triple(s: Term, p: Term, o: Term)
  /** One FILTER comparison: var op value (numeric when possible). */
  final case class Cond(variable: String, op: String, value: L, orNext: Boolean)

  final case class Query(select: Seq[String], distinct: Boolean,
                         patterns: Seq[Triple], optionals: Seq[Seq[Triple]],
                         filters: Seq[Seq[Cond]], // outer Seq = AND of OR-groups
                         orderBy: Seq[(String, Boolean)], limit: Option[Int],
                         template: Seq[Triple] = Nil) // CONSTRUCT shape

  // ---------------------------------------------------------------- parse

  private val TokenRe =
    ("""\?[A-Za-z_][A-Za-z0-9_]*|<[^>\s]*>|"(?:[^"\\]|\\.)*"(?:\^\^<[^>\s]*>|@[A-Za-z-]+)?|""" +
      """[A-Za-z][A-Za-z0-9_-]*:[A-Za-z_][A-Za-z0-9_]*|[A-Za-z_][A-Za-z0-9_]*|""" +
      """-?\d+(?:\.\d+)?|&&|\|\||[{}().,;]|[<>!=]=?|\*""").r

  def parse(q: String): Query = {
    val toks = TokenRe.findAllIn(q).toVector
    var i = 0
    def peek = if (i < toks.length) toks(i) else ""
    def next(): String = { val t = peek; i += 1; t }
    def expect(t: String): Unit = {
      val g = next(); require(g.equalsIgnoreCase(t), s"expected $t got $g")
    }
    var prefixes = Map.empty[String, String]
    while (peek.equalsIgnoreCase("PREFIX")) {
      next(); val p = next(); val iri = next()
      prefixes += p.stripSuffix(":") -> iri.stripPrefix("<").stripSuffix(">")
    }
    val isConstruct = peek.equalsIgnoreCase("CONSTRUCT")
    val select = Vector.newBuilder[String]
    var distinct = false
    def term(): Term = {
      val t = next()
      if (t.startsWith("?")) V(t.drop(1))
      else if (t.startsWith("<")) I(t.stripPrefix("<").stripSuffix(">"))
      else if (t.startsWith("\"")) {
        val lex = t.drop(1).takeWhile(_ != '"') // literal body (no escapes in subset)
        L(lex, None)
      }
      else if (t.matches("-?\\d+(\\.\\d+)?")) L(t, Some(t.toDouble))
      else if (t.contains(":")) {
        val Array(p, local) = t.split(":", 2)
        I(prefixes.getOrElse(p, p + ":") + local)
      }
      else throw new IllegalArgumentException(s"bad term $t")
    }
    def triples(): Seq[Triple] = {
      val out = Vector.newBuilder[Triple]
      while (peek != "}" && !peek.equalsIgnoreCase("OPTIONAL") &&
             !peek.equalsIgnoreCase("FILTER")) {
        out += Triple(term(), term(), term())
        if (peek == ".") next()
      }
      out.result()
    }
    val template = Vector.newBuilder[Triple]
    if (isConstruct) {
      next(); expect("{"); template ++= triples(); expect("}")
    } else {
      expect("SELECT")
      if (peek.equalsIgnoreCase("DISTINCT")) { next(); distinct = true }
      while (peek.startsWith("?")) select += next().drop(1)
    }
    expect("WHERE"); expect("{")
    val patterns = Vector.newBuilder[Triple]
    val optionals = Vector.newBuilder[Seq[Triple]]
    val filters = Vector.newBuilder[Seq[Cond]]
    while (peek != "}") {
      if (peek.equalsIgnoreCase("OPTIONAL")) {
        next(); expect("{"); optionals += triples(); expect("}")
      } else if (peek.equalsIgnoreCase("FILTER")) {
        next(); expect("(")
        val group = Vector.newBuilder[Cond]
        var more = true
        while (more) {
          val v = next(); require(v.startsWith("?"), s"FILTER needs var, got $v")
          val op = next()
          val value = term() match {
            case l: L => l
            case o => throw new IllegalArgumentException(s"FILTER value $o")
          }
          val j = peek
          if (j == "&&" || j == "||") {
            next(); group += Cond(v.drop(1), op, value, orNext = j == "||")
          } else { group += Cond(v.drop(1), op, value, orNext = false); more = false }
        }
        expect(")")
        filters += group.result()
      } else patterns ++= triples()
    }
    expect("}")
    val orderBy = Vector.newBuilder[(String, Boolean)]
    if (peek.equalsIgnoreCase("ORDER")) {
      next(); expect("BY")
      while (peek.startsWith("?") || peek.equalsIgnoreCase("ASC") ||
             peek.equalsIgnoreCase("DESC")) {
        val t = next()
        if (t.startsWith("?")) orderBy += t.drop(1) -> true
        else { expect("("); val v = next(); expect(")")
          orderBy += v.drop(1) -> t.equalsIgnoreCase("ASC") }
      }
    }
    val limit = if (peek.equalsIgnoreCase("LIMIT")) { next(); Some(next().toInt) }
    else None
    Query(select.result(), distinct, patterns.result(), optionals.result(),
      filters.result(), orderBy.result(), limit, template.result())
  }

  // -------------------------------------------------------------- compile

  /** One triple pattern → a filtered scan of quads with variable
    * bindings as columns. */
  private def scan(store: GraftStore, t: Triple): DataFrame = {
    var df = store.quads.where(col("current") &&
      col("kind") =!= InfotonModel.KindDeleted)
    var proj = Seq.empty[Column]
    t.p match {
      case I(iri) => df = df.where(col("predicate") === Rdf.localName(iri))
      case V(v) => proj :+= col("predicate").as(v)
      case l: L => throw new IllegalArgumentException(s"literal predicate $l")
    }
    t.s match {
      case I(iri) => df = df.where(col("subject") === Rdf.iriToPath(iri))
      case V(v) => proj :+= col("subject").as(v)
      case l: L => throw new IllegalArgumentException(s"literal subject $l")
    }
    t.o match {
      case I(iri) =>
        df = df.where(col("vType") === InfotonModel.TRef &&
          col("s") === Rdf.iriToPath(iri))
      case L(lex, Some(n)) => df = df.where(col("n") === n)
      case L(lex, None) => df = df.where(col("s") === lex)
      case V(v) => proj ++= Seq(col("s").as(v), col("n").as(s"${v}__n"))
    }
    df.select(proj: _*)
  }

  private def joinVars(a: DataFrame, b: DataFrame): Seq[String] =
    a.columns.filterNot(_.endsWith("__n"))
      .intersect(b.columns.filterNot(_.endsWith("__n"))).toSeq

  private def joined(a: DataFrame, b: DataFrame, how: String): DataFrame = {
    val on = joinVars(a, b)
    // a variable bound as object on BOTH sides carries a numeric
    // shadow on each — keep the left's (the join equates the canonical
    // strings) or a later FILTER hits an ambiguous reference
    val dupShadows = a.columns.intersect(b.columns).filter(_.endsWith("__n"))
    val bClean = dupShadows.foldLeft(b)(_ drop _)
    if (on.isEmpty) a.crossJoin(bClean) else a.join(bClean, on, how)
  }

  private def condCol(c: Cond): Column = {
    val target = c.value.numeric
      .map(n => (col(s"${c.variable}__n"), lit(n)))
      .getOrElse((col(c.variable), lit(c.value.lex)))
    c.op match {
      case "<" => target._1 < target._2
      case "<=" => target._1 <= target._2
      case ">" => target._1 > target._2
      case ">=" => target._1 >= target._2
      case "=" | "==" => target._1 === target._2
      case "!=" => target._1 =!= target._2
      case o => throw new IllegalArgumentException(s"bad FILTER op $o")
    }
  }

  /** `POST /_sp` (SpHandler.scala:165-253, PopulateAndQuery:360-475):
    * PATHS section = search requests whose results populate the
    * queried subgraph; SPARQL runs against just that slice. Here the
    * populate step is a predicate (union of searches = one OR filter
    * over the store), so nothing materializes — the BGP compiler's
    * scans are simply pre-filtered, and Catalyst pushes the
    * subgraph restriction into each pattern's scan. */
  def sp(store: GraftStore, paths: Seq[graft.ops.Search.Request],
         query: String): DataFrame = {
    import graft.ops.Search
    val members = paths.map(r => Search.run(store, r)
      .select(col("system.path").as("subject"))).reduce(_ union _).distinct()
    val sub = store.quads.join(members, Seq("subject"), "left_semi")
    select(store.scopedTo(sub), query)
  }

  /** Bind the WHERE block: patterns joined, OPTIONALs left-joined,
    * FILTERs applied — one row per solution, one column per variable. */
  private def solutions(store: GraftStore, q: Query): DataFrame = {
    var df = q.patterns.map(scan(store, _))
      .reduceLeft((a, b) => joined(a, b, "inner"))
    q.optionals.foreach { opt =>
      val side = opt.map(scan(store, _)).reduceLeft((a, b) => joined(a, b, "inner"))
      df = joined(df, side, "left")
    }
    q.filters.foreach { group =>
      // standard precedence: && binds tighter than || — the chain is
      // an OR of AND-runs (each Cond's orNext says which connector
      // follows it)
      val andRuns = group.foldLeft(Vector(Vector.empty[Cond])) {
        (acc, c) =>
          val updated = acc.init :+ (acc.last :+ c)
          if (c.orNext) updated :+ Vector.empty else updated
      }.filter(_.nonEmpty)
      val combined = andRuns
        .map(_.map(condCol).reduce(_ && _)).reduce(_ || _)
      df = df.where(combined)
    }
    df
  }

  /** Compile + run a SPARQL SELECT against a store. */
  def select(store: GraftStore, query: String): DataFrame = {
    val q = parse(query)
    var out = solutions(store, q).select(q.select.map(col): _*)
    if (q.distinct) out = out.distinct()
    if (q.orderBy.nonEmpty)
      out = out.orderBy(q.orderBy.map { case (v, asc) =>
        if (asc) col(v).asc_nulls_first else col(v).desc_nulls_last }: _*)
    q.limit.foreach(l => out = out.limit(l))
    out
  }

  /** Compile + run a SPARQL CONSTRUCT: instantiate the template once
    * per solution — the result is a quads-shaped frame
    * (subject, predicate, object), distinct, ready for the nt
    * formatter or re-ingest (SpHandler.scala:630-631 allows exactly
    * SELECT and CONSTRUCT). */
  def construct(store: GraftStore, query: String): DataFrame = {
    val q = parse(query)
    require(q.template.nonEmpty, "not a CONSTRUCT query")
    val bound = solutions(store, q)
    q.template.map { t =>
      def bind(tm: Term, pred: Boolean): Column = tm match {
        case V(v) => col(v)
        case I(iri) => if (pred) lit(Rdf.localName(iri))
                       else lit(Rdf.iriToPath(iri))
        case L(lex, _) => lit(lex)
      }
      bound.select(bind(t.s, pred = false).as("subject"),
        bind(t.p, pred = true).as("predicate"),
        bind(t.o, pred = false).as("obj"))
    }.reduce(_ unionByName _).distinct()
  }
}
