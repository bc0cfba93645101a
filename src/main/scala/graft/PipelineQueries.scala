package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object PipelineQueries {
  val all: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracles: Map[String, String] = Map()
}
