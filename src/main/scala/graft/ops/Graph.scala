package graft.ops

import graft.model.{GraftStore, InfotonModel}
import graft.qp.{FilterCompiler, QpParser}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph traversal operators — `xg` (expand out), `yg` (expand along a
  * path, both directions), `gqp` (path-existence filter). SURVEY.md
  * §2.3; reference eval: wsutil/package.scala:521-919 (`expandIn`,
  * `expandUp`, `deepExpandGraph`, `pathExpansionParser`, `gqpFilter`).
  *
  * Spark shape: every hop is ONE equi-join —
  *   outgoing (`>f` / xg): frontier's reference values joined to
  *     infoton paths (the reference re-issues point lookups per uuid;
  *     here it's a single distributed hash join);
  *   incoming (`<f`): a reversed equi-join through the quads view
  *     (find subjects whose field value IS a frontier path).
  * Frontiers shrink fast in practice; AQE turns the frontier side into
  * a broadcast join at runtime when it fits, which is exactly the
  * behavior we want at 100 TB — no hand scheduling.
  *
  * The reference caps expansion at 10k retrieved infotons
  * (webservice.xg.limit, application.conf:71). The cap is enforced
  * only when requested (`limit=Some(n)`): analytics jobs run
  * unbounded and pay zero extra actions; interactive callers pass the
  * reference default and get the same abort semantics.
  */
object Graph {

  /** One traversal hop: direction, reference field, optional qp filter
    * on the hop's targets (yg per-level filters, Parsers.scala:467-509). */
  final case class Hop(incoming: Boolean, field: String,
                       filter: Option[String] = None)

  /** Parse a yg/gqp expression: `<f1[qp]>f2[qp]...` */
  def parseHops(expr: String): Seq[Hop] = {
    val re = "([<>])([A-Za-z0-9_.$]+)(?:\\[([^\\]]*)\\])?".r
    val hops = re.findAllMatchIn(expr).map { m =>
      Hop(m.group(1) == "<", m.group(2), Option(m.group(3)))
    }.toSeq
    require(hops.nonEmpty, s"bad yg/gqp expression '$expr'")
    hops
  }

  /** All reference-typed fields of a store — the expansion universe for
    * the `_` / digit xg forms, derived from the type dictionary so the
    * wildcard can never silently expand over zero fields. */
  def refFields(store: GraftStore): Seq[String] =
    store.fieldTypes.collect {
      case (f, t) if t == InfotonModel.TRef => f
    }.toSeq.sorted

  /** Parse an xg expression: `f1.f2.f3` (field chain, each segment may
    * carry a per-level value filter `f[qp]`), `N` (levels over all
    * reference fields) or `_` (one level, all fields) —
    * Parsers.scala:384-465 incl. the per-level filters.
    * The wildcard forms require a non-empty reference-field universe
    * (use `refFields(store)`); expanding over zero fields would be a
    * silent wrong answer. */
  def parseXg(expr: String, allRefFields: Seq[String]): Seq[Seq[Hop]] =
    expr match {
      case "_" =>
        require(allRefFields.nonEmpty,
          "xg=_ needs the store's reference-field universe (Graph.refFields)")
        Seq(allRefFields.map(Hop(false, _)))
      case d if d.nonEmpty && d.forall(_.isDigit) =>
        require(allRefFields.nonEmpty,
          s"xg=$d needs the store's reference-field universe (Graph.refFields)")
        Seq.fill(d.toInt)(allRefFields.map(Hop(false, _)))
      case chain =>
        val seg = "([A-Za-z0-9_$]+)(?:\\[([^\\]]*)\\])?".r
        // split on dots OUTSIDE brackets only — per-level qp values may
        // themselves contain dots (e.g. refPart[retailprice>100.5])
        chain.split("\\.(?![^\\[]*\\])").toSeq.map {
          case seg(f, qp) => Seq(Hop(incoming = false, f, Option(qp)))
          case bad => throw new IllegalArgumentException(s"bad xg segment $bad")
        }
    }

  private def checkLimit(frontier: DataFrame, limit: Option[Int]): Unit =
    limit.foreach { l =>
      if (frontier.limit(l + 1).count() > l)
        throw new IllegalStateException(
          s"expansion exceeded limit $l (webservice.xg.limit semantics)")
    }

  /** Edge view for one reference field: (from, to) pairs. */
  private def edges(store: GraftStore, field: String): DataFrame =
    edgesMulti(store, Seq(field))

  /** Edge view over a SET of reference fields — one predicate-pruned
    * scan + one join for the xg `_`/digit wildcard forms, instead of a
    * union of per-field joins (shared scan: [[GraftStore.refEdges]]). */
  private def edgesMulti(store: GraftStore, fields: Seq[String]): DataFrame =
    store.refEdges(fields)

  /** Paths reachable from `frontierPaths` (col `p`) over one hop.
    * Aliased to survive self-joins in chained traversals. */
  private def hopTargets(store: GraftStore, frontierPaths: DataFrame,
                         hop: Hop): DataFrame = {
    val e = edges(store, hop.field).alias("e")
    val fr = frontierPaths.alias("fr")
    val next =
      if (hop.incoming) // reversed equi-join: edge target == frontier path
        e.join(fr, col("e.to") === col("fr.p")).select(col("e.from").as("p"))
      else              // forward: frontier's ref values are target paths
        e.join(fr, col("e.from") === col("fr.p")).select(col("e.to").as("p"))
    hop.filter.fold(next.distinct()) { f =>
      val pred = new FilterCompiler(store).compile(QpParser.parse(f))
      // flat helper column: a semi join keyed on a nested extraction
      // over self-derived union lineage trips Catalyst's nested-column
      // pruning (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND)
      store.current.where(pred)
        .select(col("system.path").as("fp"))
        .join(next.distinct(), col("fp") === col("p"), "left_semi")
        .select(col("fp").as("p"))
    }
  }

  private def paths(df: DataFrame): DataFrame =
    df.select(col("system.path").as("p")).distinct()

  /** xg — expand N levels outgoing from a search result; returns the
    * originals plus every expanded infoton (wsutil/package.scala:
    * 716-749). Each level may fan out over several fields. */
  def xg(store: GraftStore, base: DataFrame, levels: Seq[Seq[Hop]],
         limit: Option[Int] = None): DataFrame = {
    var frontier = paths(base)
    var reached = frontier
    levels.foreach { hops =>
      // plain forward hops (the whole wildcard universe) collapse into
      // ONE multi-predicate join; filtered/incoming hops stay individual
      val (plain, special) = hops.partition(h => !h.incoming && h.filter.isEmpty)
      val plainNext =
        if (plain.isEmpty) Nil
        else {
          val e = edgesMulti(store, plain.map(_.field)).alias("e")
          Seq(e.join(frontier.alias("fr"), col("e.from") === col("fr.p"))
            .select(col("e.to").as("p")))
        }
      val next = (plainNext ++ special.map(h => hopTargets(store, frontier, h)))
        .reduce(_ union _).distinct()
      checkLimit(next, limit)
      frontier = next
      reached = reached.union(next).distinct()
    }
    semiByPath(store, reached)
  }

  /** yg — chained path expansion (both directions, per-hop filters);
    * returns originals plus every infoton on a satisfied path
    * (wsutil/package.scala:850-919). */
  def yg(store: GraftStore, base: DataFrame, expr: String,
         limit: Option[Int] = None): DataFrame = {
    var frontier = paths(base)
    var reached = frontier
    parseHops(expr).foreach { hop =>
      val next = hopTargets(store, frontier, hop)
      checkLimit(next, limit)
      frontier = next
      reached = reached.union(next).distinct()
    }
    semiByPath(store, reached)
  }

  /** gqp — keep only base infotons for which the FULL hop chain
    * exists; never adds to the result (wsutil/package.scala:751-848).
    * Implemented as an origin-preserving join chain finished with one
    * LEFT SEMI JOIN. */
  def gqp(store: GraftStore, base: DataFrame, expr: String): DataFrame = {
    var chain = base.select(col("system.path").as("origin"),
      col("system.path").as("p"))
    parseHops(expr).foreach { hop =>
      val e = edges(store, hop.field).alias("e")
      val ch = chain.alias("ch")
      val nextAll =
        if (hop.incoming)
          e.join(ch, col("e.to") === col("ch.p"))
            .select(col("ch.origin").as("origin"), col("e.from").as("p"))
        else
          e.join(ch, col("e.from") === col("ch.p"))
            .select(col("ch.origin").as("origin"), col("e.to").as("p"))
      chain = hop.filter.fold(nextAll.distinct()) { f =>
        val pred = new FilterCompiler(store).compile(QpParser.parse(f))
        nextAll.join(store.current.where(pred)
            .select(col("system.path").as("fp")),
          col("p") === col("fp"), "left_semi").distinct()
      }
    }
    base.withColumn("__path", col("system.path"))
      .join(chain.select("origin").distinct(),
        col("__path") === col("origin"), "left_semi")
      .drop("__path")
  }

  /** Current infotons whose path is in `reached` (col `p`) — keyed on a
    * FLAT projected column: a semi join on the nested `system.path`
    * over the union-built frontier lineage can hit Catalyst's
    * nested-pruning INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND in Spark 4.1. */
  private def semiByPath(store: GraftStore, reached: DataFrame): DataFrame =
    store.current.withColumn("__path", col("system.path"))
      .join(reached, col("__path") === col("p"), "left_semi")
      .drop("__path")
}
