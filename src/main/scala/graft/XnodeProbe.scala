package graft

import graft.model.GraftStore
import graft.sparql.Sparql
import org.apache.spark.sql.{DataFrame, SparkSession}

/** PROBE-ONLY queries over the optional dynamic-fields table
  * (`xnodes.parquet`, see [[graft.model.TableLoader]]) — the
  * hot-predicate skew dimension (an rdf:type-shaped predicate owning
  * the store's largest quad partition). NOT part of the declared
  * oracle surface: the driver's sf dirs carry no xnodes table, so
  * these only run when Bench is invoked with `SPARK_GRAFT_XNODE=1` on
  * a generator twin that emitted it (tools/make_sf1.py /
  * tools/make_skew.py under GRAFT_XNODES).
  *
  * Both queries read EQUAL row counts on the uniform and skewed twins
  * (the generators emit the same entries-per-node; only the predicate
  * distribution differs), so skew/uniform time ratios isolate the
  * hot-partition variable — same discipline as the entity-skew sweep.
  */
object XnodeProbe {

  /** The full dynamic-predicate pool as one SPARQL alternation: the
    * compiler folds it into a single isin quad scan (one partition-
    * pruned pass over ALL dynamic quads on either twin — uniform
    * reads 400-odd small partitions, skew reads one giant `hotp`
    * partition plus stragglers). */
  private def pool: String =
    (Seq("hotp") ++ (0 until 400).map(i => f"p$i%03d"))
      .map(k => s"<cmwell://ont#$k>").mkString("|")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // scan the whole dynamic class and JOIN through the (possibly hot)
    // predicate's objects into customers — the BGP-compiler shape the
    // hot partition stresses: one side of the subject/object hash join
    // concentrated in one predicate partition
    "x_hot_alt" -> ((s, dir) => Sparql.select(GraftStore.forDir(s, dir),
      s"""PREFIX ont: <cmwell://ont#>
         |SELECT ?m (COUNT(*) AS ?cnt) WHERE {
         |  ?x $pool ?c .
         |  ?c ont:mktsegment ?m .
         |} GROUP BY ?m ORDER BY ?m""".stripMargin)),

    // variable-predicate scan anchored on the xnode class, grouped BY
    // the predicate — the aggregation key IS the skewed dimension (one
    // group holds 95% of rows on the skew twin; partial aggregation
    // must absorb it)
    "x_hot_group" -> ((s, dir) => Sparql.select(GraftStore.forDir(s, dir),
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?p (COUNT(*) AS ?cnt) WHERE {
        |  ?x ont:xid ?i .
        |  ?x ?p ?c .
        |} GROUP BY ?p ORDER BY DESC(?cnt) ?p LIMIT 20""".stripMargin)))
}
