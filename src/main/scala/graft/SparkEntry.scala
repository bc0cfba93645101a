package graft

import graft.model.GraftStore
import graft.ops.Search
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry runs a reference operator (SURVEY.md §2) through the
  * engine against the infoton store built from the driver's parquet
  * tables, and projects a result that plain ANSI SQL (the DuckDB
  * oracle) can reproduce from the raw tables. All results carry a
  * deterministic ORDER BY on both sides.
  */
object SparkEntry {

  private def store(spark: SparkSession, dir: String): GraftStore =
    GraftStore.forDir(spark, dir)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The §7.2 end-to-end slice: parse qp → compile → plan → execute. */
  def entry(spark: SparkSession): DataFrame = {
    val st = store(spark, "/root/testdata/sf0.001")
    Search.search(st,
      Search.Request(path = "/customer",
        qp = Some("mktsegment::BUILDING,acctbal>1000"),
        sortBy = Some("-acctbal")),
      offset = 0, length = 10)
      .select(col("system.path").as("path"),
        Search.fieldN("acctbal").as("acctbal"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    SearchQueries.all ++ AggQueries.all ++ GraphQueries.all ++
      ConsumeQueries.all ++ PipelineQueries.all ++ IngestQueries.all ++
      SparqlQueries.all ++ StreamQueries.all ++ AdminQueries.all ++
      XwideQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    SearchQueries.oracles ++ AggQueries.oracles ++ GraphQueries.oracles ++
      ConsumeQueries.oracles ++ PipelineQueries.oracles ++
      IngestQueries.oracles ++ SparqlQueries.oracles ++
      StreamQueries.oracles ++ AdminQueries.oracles ++
      XwideQueries.oracles
}
