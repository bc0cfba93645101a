package graft.ops

import graft.model.GraftStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Admin / maintenance surface (SURVEY.md §2.7 purge, §2.4 debug-info,
  * §2.6 tracking).
  *
  * Purges are store rewrites: at 100 TB each is one filter job that
  * rewrites only the parquet partitions containing the path's parent
  * prefix (partition pruning on `system.parent`), not the whole store.
  */
object Admin {

  /** `op=purge-all` (Application.scala:2769-2906): physically remove
    * EVERY version of a path — unlike delete_path, nothing remains,
    * not even a tombstone. */
  def purgePath(infotons: DataFrame, path: String): DataFrame =
    infotons.where(col("system.path") =!= path)

  /** `op=purge-history`: keep only the current version of a path. */
  def purgeHistory(infotons: DataFrame, path: String): DataFrame =
    infotons.where(col("system.path") =!= path || col("system.current"))

  /** `debug-info` (FTSService.scala:1020 returns the compiled ES
    * query): the compiled physical plan for a query — what the engine
    * will actually run, pushdown and all. */
  def debugInfo(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  /** `_track` (tid) analog (Application.scala:560): per-ingest-batch
    * outcome report — versions written and tombstones per parent,
    * derived by diffing the store before/after a merge. */
  def trackingReport(before: DataFrame, after: DataFrame): DataFrame = {
    val oldUuids = before.select(col("system.uuid").as("__old")).distinct()
    after
      .join(oldUuids, col("system.uuid") === col("__old"), "left_anti")
      .where(col("system.uuid").isNotNull)
      .groupBy(col("system.parent").as("parent"))
      .agg(count(lit(1)).as("written"),
        count(when(col("system.kind") === "DeletedInfoton", 1))
          .as("tombstones"))
  }

  /** VirtualInfoton `/proc` (reference ActiveInfotonGenerator;
    * Infoton.scala:441-471): store statistics synthesized AT READ TIME
    * as infotons — one `/proc/dir<parent>` per directory with version /
    * current counts and the high-water indexTime. Never stored; the
    * frame is computed from the live store on each call. */
  def proc(store: GraftStore): DataFrame = {
    import graft.model.{InfotonModel, TableLoader}
    store.infotons
      .groupBy(col("system.parent").as("dir"))
      .agg(count(lit(1)).as("versions"),
        sum(when(col("system.current"), 1L).otherwise(0L)).as("cur"),
        max(col("system.indexTime")).as("maxIt"))
      .select(
        struct(
          concat(lit("/proc/dir"), col("dir")).as("path"),
          lit("/proc").as("parent"),
          to_timestamp(lit("1970-01-01 00:00:00")).as("lastModified"),
          lit("virtual").as("lastModifiedBy"),
          lit(null).cast("string").as("uuid"),
          lit("local").as("dc"), col("maxIt").as("indexTime"),
          lit(true).as("current"),
          lit(InfotonModel.KindVirtual).as("kind"),
          lit("cmwell").as("protocol")).as("system"),
        map(
          lit("versions"), array(TableLoader.lVal(col("versions"))),
          lit("currentCount"), array(TableLoader.lVal(col("cur"))),
          lit("maxIndexTime"), array(TableLoader.lVal(col("maxIt"))))
          .as("fields"))
  }

  /** CompoundInfoton — the directory-listing envelope
    * (Infoton.scala:241-267: children + offset/length/total). One row
    * per child plus the envelope columns; total comes from a 1-row
    * aggregate cross join, not a global window. */
  def compound(store: GraftStore, path: String, offset: Int = 0,
               length: Int = Search.Limits.MaxLength): DataFrame = {
    val ch = Search.listChildren(store, path)
      .select(col("system.path").as("child"))
    val page = ch.orderBy("child").offset(offset).limit(length)
    page.crossJoin(ch.agg(count(lit(1)).as("total")))
      .withColumn("offset", lit(offset)).withColumn("length", lit(length))
  }
}
