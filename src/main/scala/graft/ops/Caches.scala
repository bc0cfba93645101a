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
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
    def walk(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => walk(a.inputPlan)
      case _: ShuffleExchangeLike => true
      case _: BroadcastExchangeLike => true
      case other => other.children.exists(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  /** Persist `df` iff a global sort directly above it would execute
    * the pipeline twice: a range-partitioned ORDER BY runs a SAMPLE
    * pass over its child to build the partition bounds, and when the
    * child plan holds NO shuffle exchange (pushed scans + broadcast
    * joins) there is no AQE-materialized stage for the sample to
    * reuse — the whole pipeline runs sample-pass-then-shuffle-pass.
    * Only join-of-scans shapes (≥2 file scans) qualify: re-running a
    * single pushed-filter scan costs about what the cache round-trip
    * does. (AdaptiveSparkPlanExec hides its tree from the generic
    * traversal, so it is unwrapped via its public inputPlan.) */
  def persistForSort(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // full traversal (no short-circuit): `scans` must be a complete
    // plan-node count even when a shuffle exists, so the two flags stay
    // independently meaningful if this heuristic is ever extended.
    // Subquery/plan EXPRESSIONS are deliberately not descended — a
    // scalar-subquery scan executes once as its own job, not per sort
    // pass, so it neither adds re-scan cost nor disqualifies the shape.
    var scans = 0
    var shuffled = false
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.inputPlan)
      case _: ShuffleExchangeLike => shuffled = true; p.children.foreach(walk)
      case s: FileSourceScanExec => scans += 1
      case other => other.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    if (!shuffled && scans >= 2) persist(df) else df
  }
}
