package graft

import org.apache.spark.sql.SparkSession

/** Repeat-profiler: times named queries K times each in ONE JVM
  * through the same noop sink [[Bench]] uses, printing every run — so
  * first-run (planning + codegen + JIT) cost separates from steady-
  * state execution. Local iteration tool only; never part of the
  * driver contract.
  *
  * Usage: runMain graft.ProfileQueries <sfDir> <repeats> <name> [name...]
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repeats = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the store ETL outside any timing, like Bench
    val store = graft.model.GraftStore.forDir(spark, sfDir)
    store.infotons.count(); store.quads.count()
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[profile] unknown query $name")
        case Some(fn) =>
          (1 to repeats).foreach { i =>
            val t = System.nanoTime()
            try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            catch { case e: Throwable =>
              System.err.println(s"[profile] $name run $i FAILED: " +
                e.getMessage.take(200))
            }
            val sec = (System.nanoTime() - t) / 1e9
            println(f"[profile] $name%-30s run $i%2d  $sec%7.2f s")
          }
          graft.pipeline.Dedup.releaseCaches()
          graft.pipeline.Similarity.releaseCaches()
      }
    }
    spark.stop()
  }
}
