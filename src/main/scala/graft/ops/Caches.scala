package graft.ops

import org.apache.spark.sql.DataFrame

/** Within-query persisted-intermediates registry for the ops layer —
  * the same discipline as [[graft.pipeline.Dedup.releaseCaches]] /
  * Similarity: Catalyst plans are TREES, so a DataFrame referenced
  * twice in one result plan is COMPUTED twice (exchange reuse only
  * dedups identical shuffles, not arbitrary subtrees). Operators whose
  * output plan embeds a small intermediate more than once (graph
  * frontiers, consume chunks, sig-terms grouped counts) persist it
  * here so the heavy upstream scan runs once per query instead of
  * once per reference.
  *
  * Everything registered is RESULT/DELTA-sized (path sets, chunk rows,
  * grouped term counts), never a base table — and it is persisted
  * INSIDE the timed query, computed fresh from the parquet inputs on
  * every invocation. Harness loops (Bench/Verify/ProfileQueries/
  * PlanDump) release at the same family boundaries where they release
  * the Dedup/Similarity registries, so a long run never accumulates
  * entries across query families. */
object Caches {
  private val registered =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist a small multi-referenced intermediate (MEMORY_AND_DISK)
    * and register it for the next family-boundary release. */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    registered.add(p)
    p
  }

  /** Unpersist every registered intermediate (non-blocking). */
  def releaseCaches(): Unit = {
    var df = registered.poll()
    while (df != null) { df.unpersist(false); df = registered.poll() }
  }

  /** True when `df`'s physical plan contains ANY exchange (shuffle or
    * broadcast). Cheap: inspects the pre-execution adaptive plan only
    * — unlike `df.rdd`, which under AQE MATERIALIZES every query stage
    * (shuffle AND broadcast stages — a full throwaway execution of the
    * frame's subtrees) just to expose the RDD. Used by the
    * spread-before-heavy-compute guards: a shuffled frame is already
    * distributed at the session's shuffle width, and a broadcast-join
    * frame's probe cost (executing the build side once, discarding it)
    * exceeds what the guard's repartition could save. */
  def hasExchange(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
    // NOTE: unwrap the adaptive node via its public `executedPlan`
    // accessor (the CURRENT physical plan — the initial plan before
    // execution), NOT `inputPlan`: inputPlan predates the
    // queryStagePreparation rules, so every ENSURE_REQUIREMENTS
    // exchange is still missing from it. After (partial) execution the
    // current plan holds QueryStageExec leaves wrapping the exchanges
    // — they count too.
    def walk(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case _: ShuffleExchangeLike => true
      case _: BroadcastExchangeLike => true
      case _: QueryStageExec => true
      case other => other.children.exists(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  /** Persist `df` iff a global sort directly above it would execute
    * heavy work twice: a range-partitioned ORDER BY runs a SAMPLE pass
    * over its child to build the partition bounds, and everything
    * between the child's last materialized exchange and the sort —
    * the whole pipeline for a pushed-scans-plus-broadcast-joins shape,
    * the join itself for a sort-merge join — executes once for the
    * sample and again for the shuffle. Join-of-scans shapes (≥2 file
    * scans) qualify; single-scan pipelines are deliberately excluded
    * because re-running one pushed-filter scan costs about what the
    * cache round-trip does (measured r17: q_sparql_lang regressed
    * under a blanket rule). The r17 formulation also required "no
    * shuffle in the child", but that test ran over
    * AdaptiveSparkPlanExec.inputPlan — which predates the
    * queryStagePreparation rules and therefore NEVER showed an
    * ENSURE_REQUIREMENTS exchange — so its de-facto (and measured:
    * q_sparql_negset 3.63 → 0.27 s steady, a sort-merge join of two
    * scans) behavior was scans-only; the condition now says what the
    * code always did. Subquery/plan EXPRESSIONS are deliberately not
    * descended — a scalar-subquery scan executes once as its own job,
    * not per sort pass. */
  def persistForSort(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    var scans = 0
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: FileSourceScanExec => scans += 1
      case other => other.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    if (scans >= 2) persist(df) else df
  }
}
