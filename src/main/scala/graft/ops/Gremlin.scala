package graft.ops

import graft.model.GraftStore
import graft.qp.{FilterCompiler, Namespaces, QpParser}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal Gremlin pipe layer over the quads view — the `_sp`
  * `Gremlin\n…` surface (SURVEY.md §2.3). The reference binds `g` to a
  * Blueprints adapter over the populated Jena model and evals Groovy
  * pipe chains through a script engine
  * (cmwell-plugin-gremlin/src/main/scala/cmwell/plugins/impl/
  * GremlinParser.scala:29-99, cmwell/blueprints/jena/JenaGraph.scala);
  * per-vertex object traversal like that serializes on the driver.
  * Spark-first re-expression: each pipe step compiles onto the store's
  * edge/property views as ONE equi-join or semi-join — the same plan
  * shapes as xg/yg hops (frontier joins; AQE broadcasts the shrinking
  * frontier side at runtime), so a pipe over 100 TB is a short join
  * chain, not a driver loop.
  *
  * Supported pipes — the chains the reference surface exercises:
  * {{{
  *   g.v("<path>")           start at one vertex (vertex id = path)
  *   g.V                     all vertices
  *   .out("f") / .out        forward over reference field(s); no arg =
  *                           every reference field (wildcard universe)
  *   .in("f")  / .in         reverse
  *   .both("f") / .both      union of both directions
  *   .has("prop", "value")   typed equality filter (same dispatch as
  *                           qp `prop::value` — numeric fields compare
  *                           numbers, not strings)
  *   .has("prop")            existence filter (qp `prop:` empty-value)
  *   .has("prop","gt","v")   typed comparator filter — gt/gte/lt/lte/
  *                           eq/neq (the Blueprints T.* comparators,
  *                           quoted; routed to qp > >> < << ::; neq =
  *                           property exists AND no value equals v)
  *   .hasNot("prop")         absence filter
  *   .dedup()                distinct frontier (hops already dedup;
  *                           kept for chain compatibility)
  *   .limit(n)               first n vertices in id order (Gremlin's
  *                           stream order is undefined; id order makes
  *                           the pipe deterministic here)
  *   .id                     terminal: vertex ids        → col `id`
  *   .values("prop")         terminal: property lexicals → col `value`
  *   .count()                terminal: row count         → col `count`
  * }}}
  * A chain without an explicit terminal ends as `.id`. Unknown pipes
  * and malformed chains fail loud — parity with the reference's
  * `[ Gremlin Syntax Error ]`, minus the silent string swallow.
  */
object Gremlin {

  private[ops] sealed trait Dir
  private[ops] case object Out extends Dir
  private[ops] case object In extends Dir
  private[ops] case object Both extends Dir

  private[ops] sealed trait Step
  private[ops] final case class Start(id: Option[String]) extends Step
  private[ops] final case class Hop(dir: Dir, field: Option[String]) extends Step
  private[ops] final case class Has(prop: String, cmp: String,
                                    value: Option[String]) extends Step
  private[ops] final case class HasNot(prop: String) extends Step
  private[ops] final case class Values(prop: String) extends Step
  private[ops] final case class Limit(n: Int) extends Step
  private[ops] case object DedupStep extends Step
  private[ops] case object Id extends Step
  private[ops] case object Count extends Step

  /** Parse `g.v("/a").out("f").has("p","v").values("n")` into steps.
    * Quoted args must not contain `)` (the reference's own start-node
    * extraction regex has the same shape, GremlinParser.scala:44). */
  private[ops] def parse(query: String): Seq[Step] = {
    val q = query.trim
    require(q == "g" || q.startsWith("g."),
      s"gremlin chain must start at g: '$query'")
    val step = """\.\s*([A-Za-z]+)\s*(?:\(\s*([^)]*?)\s*\))?""".r
    val consumed = step.findAllMatchIn(q.drop(1)).map(_.matched.length).sum
    require(1 + consumed == q.length,
      s"gremlin syntax error at char ${1 + consumed}: '$query'")
    // full-consumption arg tokenizer: comma-separated quoted strings
    // or bare integers (Gremlin never quotes counts/numeric
    // comparands: limit(5), has("acctbal","gt",500)); anything else —
    // stray characters, trailing commas, mixed garbage — fails loud,
    // never a silent drop. Bare ints cap at 9 digits so toInt is safe.
    def args(raw: String): Seq[String] = {
      val r = raw.trim
      if (r.isEmpty) return Seq.empty
      val item = java.util.regex.Pattern.compile(
        "\\s*(?:\"((?:[^\"\\\\]|\\\\.)*)\"|(\\d{1,9}))\\s*(,|$)")
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = 0
      var sawComma = false
      while (pos < r.length) {
        val m = item.matcher(r)
        m.region(pos, r.length)
        if (!m.lookingAt()) throw new IllegalArgumentException(
          s"gremlin syntax error: bad arguments ($raw)")
        out += (if (m.group(1) != null)
          m.group(1).replaceAll("\\\\(.)", "$1") else m.group(2))
        sawComma = m.group(3) == ","
        pos = m.end()
      }
      if (sawComma) throw new IllegalArgumentException(
        s"gremlin syntax error: trailing comma ($raw)")
      out.toSeq
    }
    step.findAllMatchIn(q.drop(1)).map { m =>
      val (name, as) = (m.group(1), args(Option(m.group(2)).getOrElse("")))
      (name, as) match {
        case ("v", Seq(id)) => Start(Some(id))
        case ("V", Seq()) => Start(None)
        case ("out", Seq()) => Hop(Out, None)
        case ("out", Seq(f)) => Hop(Out, Some(f))
        case ("in", Seq()) => Hop(In, None)
        case ("in", Seq(f)) => Hop(In, Some(f))
        case ("both", Seq()) => Hop(Both, None)
        case ("both", Seq(f)) => Hop(Both, Some(f))
        case ("has", Seq(p)) => Has(p, "exists", None)
        case ("has", Seq(p, v)) => Has(p, "eq", Some(v))
        case ("has", Seq(p, op, v))
          if Set("gt", "gte", "lt", "lte", "eq", "neq")(op) =>
          Has(p, op, Some(v))
        case ("hasNot", Seq(p)) => HasNot(p)
        // nonEmpty + 9-digit cap: a quoted "" or an 11-digit literal
        // must hit the loud syntax error below, not NumberFormatException
        case ("limit", Seq(n))
          if n.nonEmpty && n.length <= 9 && n.forall(_.isDigit) => Limit(n.toInt)
        case ("dedup", Seq()) => DedupStep
        case ("values", Seq(p)) => Values(p)
        case ("property", Seq(p)) => Values(p) // Blueprints alias
        case ("id", Seq()) => Id
        case ("count", Seq()) => Count
        case other => throw new IllegalArgumentException(
          s"gremlin syntax error: unsupported pipe .$name(${as.mkString(",")})")
      }
    }.toSeq
  }

  /** Evaluate a pipe chain against a store. Non-terminal steps thread a
    * one-column (`p`) frontier of vertex ids; the terminal projects it. */
  def eval(store: GraftStore, query: String): DataFrame = {
    val steps = parse(query)
    require(steps.nonEmpty && steps.head.isInstanceOf[Start],
      s"gremlin chain must start with g.v(...)/g.V: '$query'")
    var frontier: DataFrame = steps.head match {
      case Start(Some(id)) =>
        // existence-checked like Blueprints getVertex: a missing id is
        // an empty pipe, not a fabricated vertex
        store.current.where(col("system.path") === id)
          .select(col("system.path").as("p"))
      case Start(None) => store.current.select(col("system.path").as("p"))
      case _ => throw new IllegalStateException("unreachable")
    }
    var terminal: Option[DataFrame] = None
    steps.tail.foreach { s =>
      require(terminal.isEmpty,
        s"gremlin syntax error: pipe after terminal in '$query'")
      s match {
        case Hop(dir, field) =>
          val fields = field.map(Seq(_)).getOrElse(Graph.refFields(store))
          require(fields.nonEmpty, "hop over empty reference-field universe")
          val e = store.refEdges(fields).alias("e")
          val fr = frontier.alias("fr")
          def fwd = e.join(fr, col("e.from") === col("fr.p"))
            .select(col("e.to").as("p"))
          def rev = e.join(fr, col("e.to") === col("fr.p"))
            .select(col("e.from").as("p"))
          frontier = (dir match {
            case Out => fwd
            case In => rev
            case Both => fwd.unionByName(rev)
          }).distinct()
        case Has(prop, cmp, vOpt) =>
          // same typed dispatch as the qp operators — reuse the filter
          // compiler instead of re-deriving slot routing; neq is the
          // row-level negation of ::, matching MustNot semantics
          val qpExpr = (cmp, vOpt) match {
            case ("exists", None)  => s"$prop:" // empty value = exists
            case ("eq", Some(v))   => s"$prop::$v"
            case ("neq", Some(v))  => s"$prop::$v"
            case ("gt", Some(v))   => s"$prop>$v"
            case ("gte", Some(v))  => s"$prop>>$v"
            case ("lt", Some(v))   => s"$prop<$v"
            case ("lte", Some(v))  => s"$prop<<$v"
            case other => throw new IllegalArgumentException(
              s"gremlin syntax error: has comparator $other")
          }
          val pred0 = new FilterCompiler(store)
            .compile(QpParser.parse(qpExpr))
          // Blueprints T.neq requires the property to EXIST with a
          // differing value — a bare negation would match every
          // property-less vertex (directory infotons). Multi-valued
          // fields follow the qp MustNot convention: NO value equals v.
          val pred =
            if (cmp == "neq")
              new FilterCompiler(store).compile(QpParser.parse(s"$prop:")) &&
                !pred0
            else pred0
          frontier = store.current.where(pred)
            .select(col("system.path").as("fp"))
            .join(frontier, col("fp") === col("p"), "left_semi")
            .select(col("fp").as("p"))
        case HasNot(prop) =>
          val exists = new FilterCompiler(store)
            .compile(QpParser.parse(s"$prop:"))
          frontier = store.current.where(!exists)
            .select(col("system.path").as("fp"))
            .join(frontier, col("fp") === col("p"), "left_semi")
            .select(col("fp").as("p"))
        case Values(prop) =>
          val canonical = Namespaces.resolve(prop)
          terminal = Some(store.quads
            .where(col("current") && col("predicate") === canonical)
            .join(frontier, col("subject") === col("p"), "left_semi")
            .select(col("s").as("value")))
        case Limit(n) =>
          frontier = frontier.orderBy(col("p")).limit(n)
        case DedupStep =>
          frontier = frontier.distinct()
        case Id =>
          terminal = Some(frontier.select(col("p").as("id")))
        case Count =>
          terminal = Some(frontier.agg(count(lit(1)).as("count")))
        case _: Start => throw new IllegalArgumentException(
          s"gremlin syntax error: g.v/g.V mid-chain in '$query'")
      }
    }
    terminal.getOrElse(frontier.select(col("p").as("id")))
  }
}
